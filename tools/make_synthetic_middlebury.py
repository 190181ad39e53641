"""Generate layout-identical Middlebury stand-in zips with exact GT.

The real Middlebury archives (reference run.sh:7-11, README.md:41-48)
cannot be fetched in this zero-egress environment (documented in
RESULTS.md).  This tool builds zips in the EXACT layout the pipeline's
``download`` step consumes — ``eval-gray-twoframes.zip`` with
``eval-data-gray/<seq>/frame{10,11}.png`` and the middlebury-2 pair
``other-gray-twoframes.zip`` / ``other-gt-flow.zip`` with
``other-data-gray/<seq>/`` + ``other-gt-flow/<seq>/flow10.flo`` — so the
full dataset lifecycle (unpack, 50% resize, lum augmentation, mass
normalization, sweep, GT evaluation) runs unchanged.

Scenes are analytic textures (sums of sinusoids and Gaussians) sampled
exactly at both time instants under invertible affine motions, so the
ground-truth flow is exact to machine precision (the only noise is the
8-bit PNG quantization real data has too): frame10(p) = f(p),
frame11(p) = f(A^-1 (p - b)), flow10(p) = (A p + b) - p.

Usage: python tools/make_synthetic_middlebury.py <out_dir> [--size WxH]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import zipfile
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def texture(seed: int):
    """Analytic grayscale scene f(x, y) -> [0, 1]: band-limited sinusoid
    mixture plus a few Gaussian blobs (so both GN's gradient terms and
    OT's mass transport have structure at several scales).

    The [0, 1] normalization constants are fixed per (w, h) from the
    REGULAR pixel grid, not recomputed per call: frame11 samples the
    warped grid, and per-call min/max would give the two frames different
    gain/offset gauges (measured up to 5.5e-4), breaking the exact-warp
    invariant the GT claims.  With shared constants the pair is an exact
    affine warp up to the final [0, 1] clip."""
    rng = np.random.default_rng(seed)
    waves = [(rng.uniform(0.02, 0.2), rng.uniform(0.02, 0.2),
              rng.uniform(0, 2 * np.pi)) for _ in range(6)]
    blobs = [(rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
              rng.uniform(0.05, 0.15), rng.uniform(0.5, 1.0))
             for _ in range(4)]
    norms = {}                 # (w, h) -> (lo, hi) from the regular grid

    def raw(x, y, w, h):
        out = np.zeros_like(x)
        for kx, ky, ph in waves:
            out += np.sin(kx * x + ky * y + ph)
        out /= 2 * len(waves)
        for cx, cy, s, amp in blobs:
            out += amp * np.exp(-(((x / w - cx) / s) ** 2
                                  + (((y / h - cy) / s) ** 2)))
        return out

    def f(x, y, w, h):
        if (w, h) not in norms:
            xg, yg = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
            g = raw(xg, yg, w, h)
            norms[(w, h)] = (g.min(), g.max())
        lo, hi = norms[(w, h)]
        return np.clip((raw(x, y, w, h) - lo) / (hi - lo), 0.0, 1.0)

    return f


# (name, affine A, translation b) — motions a few pixels at frame scale,
# mirroring Middlebury's small-displacement two-frame regime.  A maps
# frame10 coords to frame11 coords: p' = A p + b (about the image center).
# ``translation_scale`` shrinks only the TRANSLATION components: the
# linear part's pixel displacement already scales with the canvas (a 1.2
# degree rotation moves the corner of a 320x240 frame exactly half as far
# as a 640x480 one), so the unscaled A at mb2's native 320x240 already
# matches the eval set's post-50%-resize regime — only b, which is in
# absolute pixels, needs the 0.5 (review finding, round 3: scaling A too
# double-shrank rotate/zoom/shear to half the claimed regime).
def motions(w, h, translation_scale: float = 1.0):
    c = np.array([w / 2.0, h / 2.0])

    def about_center(A, t):
        t = translation_scale * np.asarray(t)
        # p' = A (p - c) + c + t
        return A, c - A @ c + t

    R = lambda deg: np.array(
        [[np.cos(np.deg2rad(deg)), -np.sin(np.deg2rad(deg))],
         [np.sin(np.deg2rad(deg)), np.cos(np.deg2rad(deg))]])
    return [
        ("Translate", *about_center(np.eye(2), np.array([6.0, 4.0]))),
        ("Rotate", *about_center(R(1.2), np.array([0.0, 0.0]))),
        ("Zoom", *about_center(1.02 * np.eye(2), np.array([0.0, 0.0]))),
        ("Shear", *about_center(np.array([[1.0, 0.015], [0.0, 1.0]]),
                                np.array([2.0, -3.0]))),
        ("RotZoom", *about_center(1.012 * R(-0.8), np.array([-4.0, 2.0]))),
        ("Diverge", *about_center(np.array([[1.018, 0.0], [0.0, 0.985]]),
                                  np.array([3.0, 3.0]))),
        # large-displacement regime (round 5, VERDICT r4 items 5/6): ~11.7
        # px post-resize (eval zips are halved by the pipeline) / at
        # translation_scale=0.5 native (mb2) — far past the linearized
        # solvers' basin, where the pyramid and the OT solvers must carry
        ("LargeMotion", *about_center(np.eye(2), np.array([20.0, 12.0]))),
    ]


def render_pair(f, A, b, w, h):
    """Exact analytic sampling of both frames + the exact GT flow."""
    x, y = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    f10 = f(x, y, w, h)
    Ainv = np.linalg.inv(A)
    # frame11(p) = f(A^-1 (p - b)): the feature at q in frame10 appears
    # at A q + b in frame11
    xs = Ainv[0, 0] * (x - b[0]) + Ainv[0, 1] * (y - b[1])
    ys = Ainv[1, 0] * (x - b[0]) + Ainv[1, 1] * (y - b[1])
    f11 = f(xs, ys, w, h)
    u = (A[0, 0] - 1.0) * x + A[0, 1] * y + b[0]
    v = A[1, 0] * x + (A[1, 1] - 1.0) * y + b[1]
    return f10, f11, u.astype(np.float32), v.astype(np.float32)


def png_bytes(img01):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8),
                    "L").save(buf, "PNG")
    return buf.getvalue()


def flo_bytes(u, v):
    """Serialize via the framework's canonical .flo writer (single source
    of truth for the format — ofot_tpu/utils/flo.py)."""
    from ofot_tpu.utils import flo as flo_mod

    h, w = u.shape
    with tempfile.NamedTemporaryFile(suffix=".flo") as tmp:
        flo_mod.write_flo(w, h, u.ravel(), v.ravel(), tmp.name)
        tmp.seek(0)
        return tmp.read()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--size", default="640x480",
                   help="native WxH of the eval frames (resized 50% by the "
                        "pipeline, like the real archive)")
    p.add_argument("--mb2-size", default="320x240",
                   help="native WxH of the GT (middlebury-2) frames — not "
                        "resized, GT stays valid")
    args = p.parse_args()
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    w, h = (int(t) for t in args.size.split("x"))
    w2, h2 = (int(t) for t in args.mb2_size.split("x"))

    evz = out / "eval-gray-twoframes.zip"
    with zipfile.ZipFile(evz, "w") as z:
        for i, (name, A, b) in enumerate(motions(w, h)):
            f10, f11, _, _ = render_pair(texture(100 + i), A, b, w, h)
            z.writestr(f"eval-data-gray/{name}/frame10.png", png_bytes(f10))
            z.writestr(f"eval-data-gray/{name}/frame11.png", png_bytes(f11))

    dz = out / "other-gray-twoframes.zip"
    gz = out / "other-gt-flow.zip"
    with zipfile.ZipFile(dz, "w") as zd, zipfile.ZipFile(gz, "w") as zg:
        # first four motions + LargeMotion (exact GT is what makes the
        # large-displacement EE comparison possible); appended LAST so the
        # texture seeds (200+i) of the original four sequences are
        # unchanged vs earlier rounds' committed results
        mb2 = motions(w2, h2, translation_scale=0.5)
        large = next(m for m in mb2 if m[0] == "LargeMotion")
        for i, (name, A, b) in enumerate(mb2[:4] + [large]):
            f10, f11, u, v = render_pair(texture(200 + i), A, b, w2, h2)
            zd.writestr(f"other-data-gray/{name}/frame10.png",
                        png_bytes(f10))
            zd.writestr(f"other-data-gray/{name}/frame11.png",
                        png_bytes(f11))
            zg.writestr(f"other-gt-flow/{name}/flow10.flo", flo_bytes(u, v))

    print(f"wrote {evz}, {dz}, {gz}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
