"""Cross-validate the HJ criterion floor against the reference (VERDICT.md
r4 item 4).

RESULTS.md r4 diagnosed a data-dependent floor in the Hamilton–Jacobi
convergence criterion (plateau at 0.012-0.026 > tol 0.01 at any
alpha/budget) but only from OUR solver's trajectory.  This tool runs the
*reference* implementation (/root/reference/main.py --algo=foto, scipy
CSR + CG) and our solver at a matched reduced shape on the SAME input
PNGs, records both full crit trajectories, and reports whether both
plateau at the same floor.

Run (CPU, background — the reference needs seconds per iteration):
    python tools/crit_floor_ab.py --out results_r5/crit_floor_ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _prepare_pair(seq: Path, w: int, h: int, workdir: Path):
    from PIL import Image

    workdir.mkdir(parents=True, exist_ok=True)
    paths = []
    for name in ("frame10.png", "frame11.png"):
        im = Image.open(seq / name).convert("L")
        im = im.resize((w, h), Image.BILINEAR)
        out = workdir / name
        im.save(out)
        paths.append(out)
    return paths


def run_reference(f10: Path, f11: Path, nt, max_it, tol, r, reg_eps):
    """Reference foto solve; returns the crit trajectory parsed from its
    per-iteration prints (reference benamou_brenier.py:252)."""
    cmd = [sys.executable, str(Path(REF) / "main.py"),
           str(Path(f10).resolve()), str(Path(f11).resolve()),
           "--algo=foto", f"--Nt={nt}", f"--max-it={max_it}",
           f"--convergence-tol={tol}", f"--reg-epsilon={reg_eps}",
           f"--r={r}"]
    p = subprocess.run(cmd, cwd=REF, capture_output=True, text=True,
                       timeout=3600 * 3)
    traj = []
    pat = re.compile(r"^([0-9.eE+\-]+) \((\d+)/(\d+)\)$")
    for line in p.stdout.splitlines():
        m = pat.match(line.strip())
        if m:
            traj.append(float(m.group(1)))
    if p.returncode != 0:
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"reference run failed rc={p.returncode}")
    return traj


def run_ours(f10: Path, f11: Path, nt, max_it, tol, r, reg_eps):
    """Our solver, iteration by iteration (jitted single iteration, crit
    fetched per step), with the reference's exact stopping rules."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from ofot_tpu.solvers import foto
    from ofot_tpu.utils import image

    a, w, h = image.open_grayscale(str(f10))
    b, _, _ = image.open_grayscale(str(f11))
    rho0 = jnp.asarray(a, jnp.float32)
    rhoT = jnp.asarray(b, jnp.float32)
    ops = foto.stepA_ops("dct")
    step = jax.jit(partial(
        foto.alg2_iteration, r=r, reg_epsilon=reg_eps,
        convergence_tol=tol, cg_rtol=1e-6, cg_maxiter=1000, ops=ops))
    st = foto.init_state(rho0, rhoT, nt)
    traj = []
    prev = -1.0
    for i in range(max_it):
        st = step(st, rho0, rhoT)
        crit = float(st.crit)
        traj.append(crit)
        if crit <= tol:                       # reference stopping rule 1
            break
        if prev >= 0 and abs(prev - crit) < 1e-5:   # rule 2: stagnation
            break
        prev = crit
    return traj


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seq", default="data/middlebury-1/eval-data-gray/Rotate")
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=120)
    p.add_argument("--nt", type=int, default=8)
    p.add_argument("--max-it", type=int, default=400)
    p.add_argument("--tol", type=float, default=0.01)
    p.add_argument("--r", type=float, default=1.0)
    p.add_argument("--reg-eps", type=float, default=1e-3)
    p.add_argument("--workdir", default="logs_r5/crit_floor")
    p.add_argument("--out", default="results_r5/crit_floor_ab.json")
    args = p.parse_args()

    f10, f11 = _prepare_pair(Path(args.seq), args.width, args.height,
                             Path(args.workdir))
    print(f"pair prepared at {args.width}x{args.height}; running ours...",
          file=sys.stderr, flush=True)
    ours = run_ours(f10, f11, args.nt, args.max_it, args.tol,
                    args.r, args.reg_eps)
    print(f"ours: {len(ours)} its, final crit {ours[-1]:.5f}; "
          "running reference...", file=sys.stderr, flush=True)
    ref = run_reference(f10, f11, args.nt, args.max_it, args.tol,
                        args.r, args.reg_eps)

    def summary(traj):
        n = len(traj)
        reason = ("tol" if traj[-1] <= args.tol else
                  "stagnation" if n < args.max_it else "max_it")
        return {"iterations": n, "final_crit": traj[-1],
                "min_crit": min(traj), "exit": reason,
                "trajectory_every10": traj[::10], "trajectory": traj}

    out = {"config": {"seq": args.seq, "shape": [args.height, args.width],
                      "Nt": args.nt, "max_it": args.max_it,
                      "tol": args.tol, "r": args.r,
                      "reg_epsilon": args.reg_eps},
           "ours": summary(ours), "reference": summary(ref)}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if not kk.startswith("trajectory")}
                      if isinstance(v, dict) and "trajectory" in v else v
                      for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
