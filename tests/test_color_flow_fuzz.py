"""color_flow corner-case fuzz harness: C++ CLI vs Python twin, byte-level.

VERDICT.md r3 item 8: the reference ELF (/root/reference/bin/color_flow)
cannot execute here (GLIBC 2.38), so byte-parity confidence comes from
pinning the rebuilt C++ tool against the independently-implemented Python
twin (utils/colorwheel.py) on every .flo corner case the Middlebury
format admits — unknown-flow sentinel at/above the 1e9 threshold,
explicit maxmotion (including one that forces the out-of-range dimming
branch), zero motion, all-unknown fields, truncated/garbage files, and
the ``-quiet`` stats line — across the PNG/PPM/TGA output codecs (the
reference imageLib surface; .pgm errors there — 1-band only — and .pnm
is unsupported, both pinned in test_colorwheel).
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ofot_tpu.utils import colorwheel, flo

from test_colorwheel import _read_ppm, _read_tga

NATIVE = Path(__file__).resolve().parent.parent / "ofot_tpu" / "native"
RNG = np.random.default_rng(407)


def _read_png(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


READERS = {"png": _read_png, "ppm": _read_ppm, "tga": _read_tga}


@pytest.fixture(scope="module")
def native_binary():
    exe = NATIVE / "color_flow"
    if not exe.exists() and shutil.which("make"):
        subprocess.run(["make", "-C", str(NATIVE)], check=False,
                       capture_output=True)
    if not exe.exists():
        pytest.skip("native color_flow not built")
    return exe


def _write(tmp_path, u, v, name="t.flo"):
    h, w = u.shape
    fp = tmp_path / name
    flo.write_flo(w, h, u.astype(np.float32).ravel(),
                  v.astype(np.float32).ravel(), str(fp))
    return fp


def _run(native_binary, fp, out, maxmotion=None, quiet=True, check=True):
    cmd = [str(native_binary)]
    if quiet:
        cmd.append("-quiet")
    cmd += [str(fp), str(out)]
    if maxmotion is not None:
        cmd.append(str(maxmotion))
    return subprocess.run(cmd, check=check, capture_output=True, text=True)


def _assert_parity(native_binary, tmp_path, u, v, maxmotion=None,
                   exts=("png",)):
    """Native output byte-identical to the twin for every codec asked."""
    # round-trip the fields through .flo f32 quantization so the twin
    # sees exactly what the native tool reads
    fp = _write(tmp_path, u, v)
    _, _, ur, vr = flo.read_flo(str(fp))
    h, w = u.shape
    want, _, _ = colorwheel.motion_to_color(ur.reshape(h, w),
                                            vr.reshape(h, w), maxmotion)
    for ext in exts:
        out = tmp_path / f"t.{ext}"
        _run(native_binary, fp, out, maxmotion)
        np.testing.assert_array_equal(
            READERS[ext](out), want,
            err_msg=f"codec {ext}, maxmotion={maxmotion}")


def test_fuzz_random_flows_all_codecs(native_binary, tmp_path):
    """Random flows with sprinkled unknown pixels, with and without an
    explicit maxmotion, across all writable codecs."""
    for trial in range(4):
        h, w = int(RNG.integers(3, 25)), int(RNG.integers(3, 33))
        u = RNG.uniform(-9, 9, (h, w))
        v = RNG.uniform(-9, 9, (h, w))
        mask = RNG.random((h, w)) < 0.15
        u[mask] = 3e9 * RNG.choice([-1, 1], mask.sum())
        mm = None if trial % 2 == 0 else float(RNG.uniform(0.5, 12.0))
        _assert_parity(native_binary, tmp_path, u, v, mm,
                       exts=("png", "ppm", "tga"))


def test_sentinel_threshold_boundary(native_binary, tmp_path):
    """|u| == 1e9 exactly is KNOWN (strict > in both implementations,
    reference flowIO's UNKNOWN_FLOW_THRESH idiom); the next f32 above is
    unknown/black.  1e9 is exactly representable in f32 (2^9 * 1953125),
    so no quantization blurs the boundary."""
    at = np.float32(1e9)
    above = np.nextafter(at, np.float32(np.inf), dtype=np.float32)
    u = np.array([[at, -at, above, -above, 2e9, 0.0]], np.float64)
    v = np.zeros_like(u)
    _assert_parity(native_binary, tmp_path, u, v,
                   exts=("png", "ppm", "tga"))
    # and the semantics themselves: at-threshold pixels saturate the
    # normalization (rad == maxrad -> full color), above-threshold are
    # black
    fp = _write(tmp_path, u, v)
    out = tmp_path / "t.png"
    _run(native_binary, fp, out)
    rgb = _read_png(out)
    np.testing.assert_array_equal(rgb[0, 2], [0, 0, 0])
    np.testing.assert_array_equal(rgb[0, 3], [0, 0, 0])
    assert rgb[0, 0].sum() > 0 and rgb[0, 1].sum() > 0


def test_zero_motion_field_is_white(native_binary, tmp_path):
    """flow == 0 everywhere: maxrad 0 -> 1 guard in both tools; every
    pixel desaturates to pure white."""
    u = np.zeros((6, 8))
    _assert_parity(native_binary, tmp_path, u, u,
                   exts=("png", "ppm", "tga"))
    fp = _write(tmp_path, u, u)
    out = tmp_path / "z.png"
    _run(native_binary, fp, out)
    np.testing.assert_array_equal(_read_png(out), 255)


def test_all_unknown_field_is_black(native_binary, tmp_path):
    """Every pixel unknown: the native maxrad accumulator never updates
    (stays -1) and the twin's known-radius max is 0 — both must still
    emit an all-black image, not divide-by-zero garbage."""
    u = np.full((5, 7), 2e9)
    _assert_parity(native_binary, tmp_path, u, u,
                   exts=("png", "ppm", "tga"))
    fp = _write(tmp_path, u, u)
    out = tmp_path / "b.png"
    _run(native_binary, fp, out)
    np.testing.assert_array_equal(_read_png(out), 0)


def test_explicit_maxmotion_dims_out_of_range(native_binary, tmp_path):
    """maxmotion below the actual max radius exercises the rad > 1
    0.75-dimming branch; parity must hold there too, and the explicit
    scale must actually change the image vs the auto-normalized one."""
    u = np.array([[4.0, 1.0], [0.5, -3.0]])
    v = np.array([[0.0, 2.0], [-0.5, 1.0]])
    _assert_parity(native_binary, tmp_path, u, v, maxmotion=1.0,
                   exts=("png", "ppm", "tga"))
    fp = _write(tmp_path, u, v)
    a, b = tmp_path / "auto.png", tmp_path / "pinned.png"
    _run(native_binary, fp, a)
    _run(native_binary, fp, b, maxmotion=1.0)
    assert (_read_png(a) != _read_png(b)).any()


def test_maxmotion_with_zero_flow(native_binary, tmp_path):
    """Explicit maxmotion on a zero field: normalization is pinned but
    every radius is 0 -> still white, identically in both tools."""
    u = np.zeros((3, 4))
    _assert_parity(native_binary, tmp_path, u, u, maxmotion=5.0,
                   exts=("png", "tga"))


def test_truncated_flo_fails(native_binary, tmp_path):
    """Header promises more rows than the file holds -> the native reader
    must fail like the reference's ReadFlowFile, not read garbage."""
    fp = _write(tmp_path, np.ones((8, 8)), np.ones((8, 8)))
    data = fp.read_bytes()
    for cut in (len(data) - 4, len(data) // 2, 13):
        bad = tmp_path / f"cut{cut}.flo"
        bad.write_bytes(data[:cut])
        r = _run(native_binary, bad, tmp_path / "o.png", check=False)
        assert r.returncode != 0, f"cut at {cut} byte(s) accepted"
        assert "problem reading file" in r.stderr


def test_garbage_tag_and_illegal_dims(native_binary, tmp_path):
    """Wrong magic and out-of-range dimensions reproduce the reference
    ELF's embedded diagnostics strings."""
    import struct

    def flo_bytes(tag, w, h, payload=b""):
        return struct.pack("<fii", tag, w, h) + payload

    cases = [
        (flo_bytes(123.456, 4, 4), "wrong tag"),
        (flo_bytes(202021.25, -3, 4), "illegal width"),
        (flo_bytes(202021.25, 4, -3), "illegal height"),
        (flo_bytes(202021.25, 100000, 4), "illegal width"),
        (flo_bytes(202021.25, 4, 100000), "illegal height"),
    ]
    for i, (blob, msg) in enumerate(cases):
        bad = tmp_path / f"bad{i}.flo"
        bad.write_bytes(blob)
        r = _run(native_binary, bad, tmp_path / "o.png", check=False)
        assert r.returncode != 0 and msg in r.stderr, (msg, r.stderr)


def test_quiet_stats_text_pinned(native_binary, tmp_path):
    """The non-quiet stats line format is pinned (reference colorcode
    prints 'max motion: %.4f  motion range: ...'); -quiet suppresses it.
    Unknown pixels must be excluded from the reported motion range."""
    u = np.array([[0.25, -1.5, 2e9]])
    v = np.array([[3.0, -0.125, 2e9]])
    fp = _write(tmp_path, u, v)
    out = tmp_path / "s.png"
    rq = _run(native_binary, fp, out, quiet=True)
    assert rq.stdout == ""
    rv = _run(native_binary, fp, out, quiet=False)
    maxrad = max(np.hypot(0.25, 3.0), np.hypot(1.5, 0.125))
    want = ("max motion: %.4f  motion range: u = %.3f .. %.3f;  "
            "v = %.3f .. %.3f\n" % (maxrad, -1.5, 0.25, -0.125, 3.0))
    assert rv.stdout == want


def test_nan_flow_is_unknown(native_binary, tmp_path):
    """NaN pixels count as unknown (the reference's unknown_flow has an
    explicit NaN test) — the native tool used to SEGFAULT here and the
    Python twin indexed the wheel with a garbage cast (review, round 4)."""
    u = np.array([[np.nan, 1.0, 0.5], [np.nan, np.nan, -1.0]])
    v = np.array([[0.0, np.nan, 0.25], [1.0, np.nan, 0.5]])
    _assert_parity(native_binary, tmp_path, u, v,
                   exts=("png", "ppm", "tga"))
    fp = _write(tmp_path, u, v)
    out = tmp_path / "n.png"
    _run(native_binary, fp, out)
    rgb = _read_png(out)
    np.testing.assert_array_equal(rgb[0, 0], 0)     # NaN u
    np.testing.assert_array_equal(rgb[0, 1], 0)     # NaN v
    np.testing.assert_array_equal(rgb[1, 1], 0)     # both NaN
    assert rgb[0, 2].sum() > 0                       # known pixel colored


def test_uppercase_extensions(native_binary, tmp_path):
    """.PNG / .TGA accepted like the reference WriteImage's uppercase
    strcmp pairs."""
    u = np.array([[1.0, -1.0]])
    fp = _write(tmp_path, u, np.zeros_like(u))
    for name in ("T.PNG", "T.TGA"):
        _run(native_binary, fp, tmp_path / name)
        assert (tmp_path / name).exists()
