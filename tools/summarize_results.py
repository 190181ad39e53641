"""Summarize a pipeline results tree into a markdown table.

Reads the ``<results>/<dataset>/<sequence>/<algo>.benchmark.txt`` files
(the reference's exact byte format, reference main.py:125-134) plus
``manifest.json`` and prints per-sequence EE/AE/IE rows per algorithm —
the table RESULTS.md embeds.

Usage: python tools/summarize_results.py <results_dir> [--datasets a,b]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _escalation_mark(diag: dict) -> str:
    """One-character escalation note for a manifest entry (precedence:
    failed > f64 > on-device exact)."""
    if diag.get("escalation_failed"):
        return "!"
    if diag.get("escalated_f64"):
        return "*"
    if diag.get("escalated_exact") or diag.get("stabilizer") == "exact":
        return "+"
    return ""


def parse_benchmark(path: Path) -> dict:
    out = {}
    for line in path.read_text().splitlines():
        k, _, v = line.partition(": ")
        out[k] = v.rstrip("s") if k == "time" else v
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("results")
    p.add_argument("--datasets", default=None,
                   help="comma list; default: every dataset dir present")
    args = p.parse_args()
    root = Path(args.results)
    datasets = (args.datasets.split(",") if args.datasets else
                sorted(d.name for d in root.iterdir() if d.is_dir()))

    manifest = {}
    mpath = root / "manifest.json"
    if mpath.exists():
        manifest = json.loads(mpath.read_text())

    for ds in datasets:
        seqs = sorted(d for d in (root / ds).iterdir() if d.is_dir())
        algos = sorted({f.name.split(".")[0] for s in seqs
                        for f in s.glob("*.benchmark.txt")})
        has_gt = any("EE-mean" in parse_benchmark(f)
                     for s in seqs for f in s.glob("*.benchmark.txt"))
        print(f"\n### {ds}\n")
        hdr = "| sequence | algo | " + ("EE | AE | " if has_gt else "") \
            + "IE | time (s) | iters | crit |"
        print(hdr)
        print("|" + "---|" * (hdr.count("|") - 1))
        agg = {}                      # algo -> list of (EE, AE, IE) rows
        for s in seqs:
            for algo in algos:
                f = s / f"{algo}.benchmark.txt"
                if not f.exists():
                    continue
                b = parse_benchmark(f)
                row = [s.name, algo]
                if has_gt:
                    row += [f"{float(b['EE-mean']):.3f}"
                            if "EE-mean" in b else "—",
                            f"{float(b['AE-mean']):.3f}"
                            if "AE-mean" in b else "—"]
                row += [f"{float(b['IE']):.3f}", f"{float(b['time']):.2f}"]
                # per-sequence solver diagnostics from the manifest
                # (recorded by both sweep modes: batch directly, the
                # per-sequence path via --log-jsonl)
                diag = (manifest.get(f"{ds}/{s.name}", {})
                        .get({"gn": "GN", "wfr": "WFR"}.get(algo, algo), {}))
                iters = diag.get("iterations",          # ALG2 / sinkhorn
                                 diag.get("inner_iterations"))  # GN PCG
                note = _escalation_mark(diag)
                row += [(str(int(iters)) if iters is not None else "—")
                        + note,
                        f"{diag['crit']:.4f}" if "crit" in diag else "—"]
                agg.setdefault(algo, []).append(
                    tuple(float(b[k]) if k in b else None
                          for k in ("EE-mean", "AE-mean", "IE")))
                print("| " + " | ".join(row) + " |")
        for algo, rows in sorted(agg.items()):
            cells = ["**mean**", algo]
            for j in (0, 1) if has_gt else ():
                vals = [r[j] for r in rows if r[j] is not None]
                cells.append(f"{sum(vals) / len(vals):.3f}" if vals else "—")
            ies = [r[2] for r in rows if r[2] is not None]
            cells += [f"{sum(ies) / len(ies):.3f}" if ies else "—",
                      "—", "—", "—"]              # time / iters / crit
            print("| " + " | ".join(cells) + " |")
    if manifest:
        walls = [v.get("wall_s", 0) for e in manifest.values()
                 for v in e.values() if isinstance(v, dict)]
        print(f"\n{len(manifest)} sequences, "
              f"{sum(1 for _ in walls)} solves, "
              f"total solver wall {sum(walls):.1f}s")
        marks = [("+", "exactly-stabilized f32 on-device re-solve"),
                 ("*", "f64-CPU escalation"),
                 ("!", "ESCALATION FAILED — f32-floor artifacts shipped")]
        # same precedence function as the rows, so the legend can never
        # list a mark that appears nowhere (review, round 5)
        used = {_escalation_mark(v) for e in manifest.values()
                for v in e.values() if isinstance(v, dict)}
        legend = [f"{m} = {txt}" for m, txt in marks if m in used]
        if legend:
            print("iteration-count marks: " + "; ".join(legend))
    return 0


if __name__ == "__main__":
    sys.exit(main())
