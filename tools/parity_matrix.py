"""Parity matrix: ours vs the reference CLI across algorithms/params/sizes.

Runs both CLIs on synthetic pairs over a grid of configurations and reports
the AEPE between the .flo outputs and the IE agreement.  Used to back the
parity claims in BENCHMARKS.md; run manually (the reference's pure-Python
loops make FOTO slow at larger sizes):

    python tools/parity_matrix.py
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))

from ofot_tpu.utils import image, flo  # noqa: E402


def make_pair(kind: str, h: int, w: int):
    # crc32, not hash(): str hashing is salted per process, which
    # would make the recorded parity numbers irreproducible
    import zlib
    rng = np.random.default_rng(zlib.crc32(kind.encode()))
    y, x = np.mgrid[0:h, 0:w]
    if kind == "square":
        f1 = np.zeros((h, w))
        f2 = np.zeros((h, w))
        f1[h // 6: 3 * h // 6, w // 6: 3 * w // 6] = 1.0
        f2[2 * h // 6: 4 * h // 6, 2 * w // 6: 4 * w // 6] = 1.0
    elif kind == "texture":
        base = (np.sin(x / 7.0) * np.cos(y / 5.0)
                + np.sin((x + 2 * y) / 13.0) + 2.2) / 4.4
        f1 = np.clip(base + 0.05 * rng.standard_normal((h, w)), 0, 1)
        f2 = np.roll(np.roll(f1, 2, 0), 1, 1)
    else:  # blob
        f1 = np.exp(-(((y - h / 2 + 2) / (h / 5.0)) ** 2
                      + ((x - w / 2 + 3) / (w / 5.0)) ** 2))
        f2 = np.exp(-(((y - h / 2 - 2) / (h / 5.0)) ** 2
                      + ((x - w / 2 - 3) / (w / 5.0)) ** 2))
    return f1, f2


CONFIGS = [
    ("GN", "square", 32, 32, ["--alpha=0.1", "--lambda=0.2"]),
    ("GN", "texture", 48, 64, ["--alpha=0.1", "--lambda=0.2"]),
    ("GN", "blob", 40, 56, ["--alpha=0.05", "--lambda=0.4"]),
    ("GN", "texture", 48, 64, ["--alpha=1.0", "--lambda=0.05"]),
    ("foto", "square", 24, 24,
     ["--Nt=4", "--r=1", "--convergence-tol=0.05", "--reg-epsilon=1e-2",
      "--max-it=12"]),
    ("foto", "blob", 32, 40,
     ["--Nt=6", "--r=2", "--convergence-tol=0.05", "--reg-epsilon=1e-3",
      "--max-it=10"]),
    ("foto", "texture", 32, 40,
     ["--Nt=4", "--r=0.5", "--convergence-tol=0.01", "--reg-epsilon=1e-2",
      "--max-it=8", "--normalize"]),
]


def main() -> int:
    print(f"{'algo':5} {'pair':8} {'size':9} {'params':44} "
          f"{'AEPE':>10} {'maxEPE':>10}")
    worst = 0.0
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        for algo, kind, h, w, params in CONFIGS:
            f1, f2 = make_pair(kind, h, w)
            p1, p2 = td / "f0.png", td / "f1.png"
            image.save_grayscale(f1, str(p1))
            image.save_grayscale(f2, str(p2))
            ours, refs = td / "ours.flo", td / "ref.flo"
            r = subprocess.run(
                [sys.executable, "-m", "ofot_tpu.cli.main", str(p1), str(p2),
                 f"--algo={algo}", f"--out={ours}", "--platform=cpu",
                 "--precision=f64", "--quiet"] + params,
                cwd=REPO, capture_output=True, text=True, timeout=1200)
            assert r.returncode == 0, r.stderr[-2000:]
            r = subprocess.run(
                [sys.executable, "main.py", str(p1), str(p2),
                 f"--algo={algo}", f"--out={refs}"] + params,
                cwd=REF, capture_output=True, text=True, timeout=1200)
            assert r.returncode == 0, r.stderr[-2000:]
            _, _, u1, v1 = flo.read_flo(str(ours))
            _, _, u2, v2 = flo.read_flo(str(refs))
            epe = np.sqrt((u1 - u2) ** 2 + (v1 - v2) ** 2)
            worst = max(worst, epe.mean())
            print(f"{algo:5} {kind:8} {h}x{w:<6} {' '.join(params)[:44]:44} "
                  f"{epe.mean():10.2e} {epe.max():10.2e}")
    print(f"\nworst AEPE: {worst:.2e}  (budget 0.05)")
    return 0 if worst < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
