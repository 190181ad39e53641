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


# Golden probes hand-derived from the PUBLISHED Middlebury colorcode.cpp
# algorithm (55-entry wheel RY15/YG6/GC4/CB11/BM13/MR6, hue =
# atan2(-v,-u)/pi mapped over 54 arcs, integer wheel entries 255*i/N,
# white-at-zero desaturation, uint8 truncation) — independent of BOTH
# implementations under test (VERDICT.md r2 missing #3: pins pixel parity
# without running the reference ELF).
#   (1,0):  atan2(-0,-1) = -pi (IEEE negative zero) -> a=-1 -> fk=0 ->
#           wheel[0] = pure red (255, 0, 0)
#   (-1,0): atan2(-0,+1) = -0 -> a=0 -> fk=27 (CB i=2) ->
#           (0, 255-255*2//11, 255) = (0, 209, 255)
#   (0,0):  rad=0 -> fully desaturated -> white
#   (.5,0): wheel[0] at rad=.5 -> 1-.5*(1-c): (255, 127, 127)
#   (0,1):  atan2(-1,-0) = -pi/2 -> a=-.5 -> fk=13.5, lerp RY i=13/14:
#           G = (221+238)/2 = 229.5 -> truncates to (255, 229, 0)
GOLDEN_PROBES = [
    ((1.0, 0.0), (255, 0, 0)),
    ((-1.0, 0.0), (0, 209, 255)),
    ((0.0, 0.0), (255, 255, 255)),
    ((0.5, 0.0), (255, 127, 127)),
    ((0.0, 1.0), (255, 229, 0)),
]


def test_golden_rgb_probes_python():
    for (u, v), want in GOLDEN_PROBES:
        got = colorwheel.compute_color(np.array([[u]]), np.array([[v]]))[0, 0]
        np.testing.assert_array_equal(got, want, err_msg=f"probe {(u, v)}")


def test_golden_rgb_probes_jax():
    import jax.numpy as jnp
    for (u, v), want in GOLDEN_PROBES:
        got = np.asarray(colorwheel.compute_color_jax(
            jnp.array([[u]]), jnp.array([[v]])))[0, 0]
        np.testing.assert_array_equal(got, want, err_msg=f"probe {(u, v)}")


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


def test_golden_rgb_probes_native(native_binary, tmp_path):
    """The C++ tool reproduces the published-algorithm probes exactly
    (maxmotion=1 pins the normalization)."""
    from PIL import Image
    uv = np.array([p for p, _ in GOLDEN_PROBES], np.float32)
    want = np.array([c for _, c in GOLDEN_PROBES], np.uint8)
    n = len(GOLDEN_PROBES)
    fp = tmp_path / "probe.flo"
    flo.write_flo(n, 1, uv[:, 0], uv[:, 1], str(fp))
    out = tmp_path / "probe.png"
    subprocess.run([str(native_binary), "-quiet", str(fp), str(out), "1"],
                   check=True)
    got = np.asarray(Image.open(out).convert("RGB"))[0]
    np.testing.assert_array_equal(got, want)


def _read_ppm(path):
    data = path.read_bytes()
    assert data.startswith(b"P6\n")
    head, _, rest = data.partition(b"255\n")
    dims = head.split(b"\n")[1].split()
    w, h = int(dims[0]), int(dims[1])
    return np.frombuffer(rest, np.uint8).reshape(h, w, 3)


def _read_tga(path):
    data = path.read_bytes()
    assert data[2] == 2 and data[16] == 24          # type 2, 24 bpp
    w = data[12] | (data[13] << 8)
    h = data[14] | (data[15] << 8)
    px = np.frombuffer(data[18:], np.uint8).reshape(h, w, 3)
    # rows are TOP-DOWN (parity with the reference WriteFileTGA, which
    # fwrites y = 0..h-1 with descriptor 0); BGR -> RGB
    return px[:, :, ::-1]


@pytest.mark.parametrize("ext,reader", [("ppm", _read_ppm),
                                        ("tga", _read_tga)])
def test_native_pnm_tga_outputs(native_binary, tmp_path, ext, reader):
    """The reference ELF's imageLib carries PNG/PPM/TGA codecs (strings in
    reference bin/color_flow); the rebuilt tool honors the same output
    extensions with identical pixels across formats.  (.pgm errors like
    the reference's 1-band-only WriteFilePGM — see the fuzz harness.)"""
    h, w = 10, 14
    u = RNG.uniform(-3, 3, (h, w)).astype(np.float32)
    v = RNG.uniform(-3, 3, (h, w)).astype(np.float32)
    fp = tmp_path / "t.flo"
    flo.write_flo(w, h, u.ravel(), v.ravel(), str(fp))
    out = tmp_path / f"t.{ext}"
    subprocess.run([str(native_binary), "-quiet", str(fp), str(out)],
                   check=True)
    want, _, _ = colorwheel.motion_to_color(u, v)
    np.testing.assert_array_equal(reader(out), want)


def test_native_unknown_extension_fails(native_binary, tmp_path):
    fp = tmp_path / "t.flo"
    flo.write_flo(2, 2, np.zeros(4), np.zeros(4), str(fp))
    r = subprocess.run([str(native_binary), str(fp),
                        str(tmp_path / "t.bmp")],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "unknown image extension" in r.stderr
    # reference parity: .pgm is 1-band-only, .pnm unsupported, and a
    # non-.flo input is rejected before reading (review, round 4)
    for name, msg in (("t.pgm", "can only write 1-band image as pgm"),
                      ("t.pnm", "file type not supported")):
        r = subprocess.run([str(native_binary), str(fp),
                            str(tmp_path / name)],
                           capture_output=True, text=True)
        assert r.returncode != 0 and msg in r.stderr, (name, r.stderr)
    bad_in = tmp_path / "t.dat"
    bad_in.write_bytes(fp.read_bytes())
    r = subprocess.run([str(native_binary), str(bad_in),
                        str(tmp_path / "o.png")],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "extension .flo expected" in r.stderr


def test_native_usage_and_bad_file(native_binary, tmp_path):
    r = subprocess.run([str(native_binary)], capture_output=True, text=True)
    assert r.returncode != 0 and "usage:" in r.stderr
    bad = tmp_path / "bad.flo"
    bad.write_bytes(b"\x00" * 32)
    r = subprocess.run([str(native_binary), str(bad), str(tmp_path / "o.png")],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "wrong tag" in r.stderr


def test_cli_main_entry(tmp_path):
    """The ofot-color-flow console-script entry (pyproject) parses the
    native tool's surface and writes the PNG (review, round 4: the
    script used to point at flow_to_png, which crashes as an entry)."""
    fp = tmp_path / "t.flo"
    flo.write_flo(4, 3, np.ones(12), np.zeros(12), str(fp))
    out = tmp_path / "t.png"
    assert colorwheel.cli_main(["-quiet", str(fp), str(out)]) == 0
    assert out.exists()
    assert colorwheel.cli_main([str(fp), str(out), "2.5"]) == 0
    assert colorwheel.cli_main([]) == 1
