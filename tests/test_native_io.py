"""Native PNG I/O extension: parity with PIL and integration."""

import numpy as np
import pytest
from PIL import Image

from ofot_tpu.utils import image

RNG = np.random.default_rng(81)


def test_open_save_roundtrip(tmp_path):
    f = RNG.random((24, 31))
    p = tmp_path / "x.png"
    image.save_grayscale(f, str(p))
    f2, w, h = image.open_grayscale(str(p))
    assert (w, h) == (31, 24)
    assert np.abs(f2 - f).max() < 1.0 / 255 + 1e-9


@pytest.mark.skipif(image._native_io is None, reason="extension not built")
class TestNative:
    def test_rgb_luma_matches_pil(self, tmp_path):
        rgb = RNG.integers(0, 256, (18, 22, 3), dtype=np.uint8)
        p = tmp_path / "rgb.png"
        Image.fromarray(rgb, "RGB").save(p)
        ours, w, h = image.open_grayscale(str(p))
        pil = np.asarray(Image.open(p).convert("L")).astype(np.float64) / 255
        np.testing.assert_array_equal(ours, pil)

    def test_palette_png(self, tmp_path):
        img = Image.fromarray(
            RNG.integers(0, 256, (10, 12), dtype=np.uint8), "L").convert("P")
        p = tmp_path / "pal.png"
        img.save(p)
        ours, w, h = image.open_grayscale(str(p))
        pil = np.asarray(Image.open(p).convert("L")).astype(np.float64) / 255
        np.testing.assert_array_equal(ours, pil)

    def test_16bit_png(self, tmp_path):
        """PIL opens 16-bit gray as mode 'I' and convert('L') CLIPS at 255
        (not high-byte truncation) — the native decoder must match it
        bit-for-bit, or solves diverge depending on whether the extension
        is built."""
        arr16 = RNG.integers(0, 65536, (8, 9), dtype=np.uint16)
        arr16[0, :4] = [30000, 100, 255, 256]    # clip-boundary cases
        p = tmp_path / "g16.png"
        Image.fromarray(arr16, "I;16").save(p)
        ours, w, h = image.open_grayscale(str(p))
        assert (w, h) == (9, 8)
        pil = np.asarray(Image.open(p).convert("L")).astype(np.float64) / 255
        np.testing.assert_array_equal(ours, pil)

    def test_adam7_interlaced_png(self, tmp_path):
        """Interlaced PNGs must de-interlace (per-row reads would silently
        scramble them).  PIL cannot write Adam7, so hand-encode one."""
        import struct
        import zlib

        def chunk(tag, payload):
            c = tag + payload
            return (struct.pack(">I", len(payload)) + c
                    + struct.pack(">I", zlib.crc32(c)))

        W = H = 8
        img = RNG.integers(0, 256, (H, W), dtype=np.uint8)
        adam7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = b""
        for (x0, y0, dx, dy) in adam7:
            for y in range(y0, H, dy):
                raw += b"\x00" + bytes(int(img[y, x])
                                       for x in range(x0, W, dx))
        ihdr = struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 1)  # interlace=1
        p = tmp_path / "adam7.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                      + chunk(b"IDAT", zlib.compress(raw))
                      + chunk(b"IEND", b""))
        # sanity: PIL agrees with the encoder
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
        ours, w, h = image.open_grayscale(str(p))
        np.testing.assert_array_equal(ours, img.astype(np.float64) / 255)

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            image.open_grayscale("/nonexistent/x.png")

    def test_bad_png_raises(self, tmp_path):
        p = tmp_path / "bad.png"
        p.write_bytes(b"not a png at all")
        with pytest.raises(ValueError):
            image.open_grayscale(str(p))

    def test_writes_readable_by_pil(self, tmp_path):
        f = RNG.random((12, 14))
        p = tmp_path / "w.png"
        image.save_grayscale(f, str(p))
        pil = np.asarray(Image.open(p))
        assert pil.shape == (12, 14)
        np.testing.assert_array_equal(
            pil, np.uint8(255 * np.clip(f, 0, 1)))
