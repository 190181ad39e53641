"""Dataset preparation path: local-zip extraction, resize, lum, normalize."""

import io
import zipfile

import numpy as np

from ofot_tpu.cli import pipeline
from ofot_tpu.utils import image
import fixtures


def _make_zip(path, n_seq=2):
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n_seq):
            f1, f2 = fixtures.translating_square(40)
            for name, f in (("frame10.png", f1), ("frame11.png", f2)):
                buf = io.BytesIO()
                from PIL import Image
                Image.fromarray(np.uint8(255 * f), "L").save(buf, "PNG")
                z.writestr(f"eval-data-gray/seq{i}/{name}", buf.getvalue())
        z.writestr("other-junk/readme.txt", "ignored")


def test_download_from_local_zip(tmp_path):
    zp = tmp_path / "eval-gray-twoframes.zip"
    _make_zip(zp)
    rc = pipeline.main(["download", "--data-root", str(tmp_path / "data"),
                        "--local-zip", str(zp)])
    assert rc == 0

    mb1 = tmp_path / "data" / "middlebury-1" / "eval-data-gray"
    lum = tmp_path / "data" / "middlebury-1-lum" / "eval-data-gray"
    assert sorted(p.name for p in mb1.iterdir()) == ["seq0", "seq1"]
    assert sorted(p.name for p in lum.iterdir()) == ["seq0", "seq1"]
    assert not (tmp_path / "data" / "middlebury-1" / "other-junk").exists()

    # resized to 50%
    f, w, h = image.open_grayscale(str(mb1 / "seq0" / "frame10.png"))
    assert (w, h) == (20, 20)

    # mass-normalized: both frames share a common max of 1.0-ish
    f1, _, _ = image.open_grayscale(str(mb1 / "seq0" / "frame10.png"))
    f2, _, _ = image.open_grayscale(str(mb1 / "seq0" / "frame11.png"))
    assert 0.9 <= max(f1.max(), f2.max()) <= 1.0

    # lum variant differs from the base frame11 (random artifacts added)
    b, _, _ = image.open_grayscale(str(mb1 / "seq1" / "frame11.png"))
    l, _, _ = image.open_grayscale(str(lum / "seq1" / "frame11.png"))
    assert np.abs(b - l).max() > 0.01


def test_download_seed_determinism(tmp_path):
    zp = tmp_path / "z.zip"
    _make_zip(zp, 1)
    for d in ("a", "b"):
        rc = pipeline.main(["download", "--data-root", str(tmp_path / d),
                            "--local-zip", str(zp), "--lum-seed", "7"])
        assert rc == 0
    fa, _, _ = image.open_grayscale(
        str(tmp_path / "a" / "middlebury-1-lum" / "eval-data-gray" / "seq0"
            / "frame11.png"))
    fb, _, _ = image.open_grayscale(
        str(tmp_path / "b" / "middlebury-1-lum" / "eval-data-gray" / "seq0"
            / "frame11.png"))
    np.testing.assert_array_equal(fa, fb)
