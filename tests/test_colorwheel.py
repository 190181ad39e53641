"""Middlebury color-wheel encoding: Python twin + native C++ CLI."""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ofot_tpu.utils import colorwheel, flo

NATIVE = Path(__file__).resolve().parent.parent / "ofot_tpu" / "native"
RNG = np.random.default_rng(51)


def test_wheel_structure():
    w = colorwheel.make_colorwheel()
    assert w.shape == (55, 3)
    np.testing.assert_array_equal(w[0], [255, 0, 0])       # pure red start
    assert w.min() >= 0 and w.max() <= 255


def test_zero_flow_is_white():
    rgb, maxrad, _ = colorwheel.motion_to_color(np.zeros((4, 4)),
                                                np.zeros((4, 4)))
    assert maxrad == 1.0
    np.testing.assert_array_equal(rgb, 255)


def test_unknown_flow_is_black():
    u = np.zeros((3, 3))
    u[0, 0] = 2e9
    rgb, _, _ = colorwheel.motion_to_color(u, np.ones((3, 3)))
    np.testing.assert_array_equal(rgb[0, 0], [0, 0, 0])
    assert rgb[1:].max() > 0


def test_out_of_range_dimmed():
    """Radius > 1 (with explicit maxmotion) dims by 0.75."""
    u = np.array([[3.0]])
    v = np.array([[0.0]])
    rgb_in, _, _ = colorwheel.motion_to_color(u, v)            # normalized
    rgb_out, _, _ = colorwheel.motion_to_color(u, v, maxmotion=1.0)
    assert rgb_out.astype(int).sum() < rgb_in.astype(int).sum()


@pytest.fixture(scope="module")
def native_binary():
    exe = NATIVE / "color_flow"
    if not exe.exists() and shutil.which("make"):
        subprocess.run(["make", "-C", str(NATIVE)], check=False,
                       capture_output=True)
    if not exe.exists():
        pytest.skip("native color_flow not built")
    return exe


def test_native_matches_python_twin(native_binary, tmp_path):
    from PIL import Image
    h, w = 24, 30
    u = RNG.uniform(-4, 4, (h, w)).astype(np.float32)
    v = RNG.uniform(-4, 4, (h, w)).astype(np.float32)
    u[0, :2] = 2e9                                # unknown-flow pixels
    fp = tmp_path / "t.flo"
    flo.write_flo(w, h, u.ravel(), v.ravel(), str(fp))
    out = tmp_path / "t.png"
    subprocess.run([str(native_binary), "-quiet", str(fp), str(out)],
                   check=True)
    got = np.asarray(Image.open(out).convert("RGB"))
    want, _, _ = colorwheel.motion_to_color(u, v)
    np.testing.assert_array_equal(got, want)


def test_native_usage_and_bad_file(native_binary, tmp_path):
    r = subprocess.run([str(native_binary)], capture_output=True, text=True)
    assert r.returncode != 0 and "usage:" in r.stderr
    bad = tmp_path / "bad.flo"
    bad.write_bytes(b"\x00" * 32)
    r = subprocess.run([str(native_binary), str(bad), str(tmp_path / "o.png")],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "wrong tag" in r.stderr
