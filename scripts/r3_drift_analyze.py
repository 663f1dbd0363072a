"""Analyze the drift run's metrics.jsonl: fg/bg depth-loss vs eval PSNR.

Usage: python scripts/r3_drift_analyze.py [logs/r3_drift/hard_depth_drift/metrics.jsonl]
Prints a coarse table (iter, depth_loss_fg, depth_loss_bg, fg_frac,
test_psnr) plus the correlation summary for RESULTS.md.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "logs/r3_drift/hard_depth_drift/metrics.jsonl"
    )
    rows = [json.loads(l) for l in open(path)]
    train = [r for r in rows if "depth_loss_fg" in r]
    evals = [r for r in rows if "test_psnr" in r]
    print(f"{len(train)} train rows, {len(evals)} eval rows")
    print(f"{'iter':>7} {'fg_loss':>10} {'bg_loss':>10} {'fg_frac':>8} {'psnr':>7}")
    ev = {r["step"]: r["test_psnr"] for r in evals}
    stride = max(1, len(train) // 25)
    for r in train[::stride]:
        p = ev.get(r["step"], float("nan"))
        print(
            f"{r['step']:>7} {r['depth_loss_fg']:>10.5f} "
            f"{r['depth_loss_bg']:>10.5f} {r['fg_frac']:>8.3f} {p:>7.2f}"
        )
    # windowed means before/after the eval peak
    if evals:
        steps = np.array([r["step"] for r in evals])
        psnrs = np.array([r["test_psnr"] for r in evals])
        peak = steps[int(np.argmax(psnrs))]
        print(f"\neval peak: {psnrs.max():.3f} dB at iter {peak}")
        for name in ("depth_loss_fg", "depth_loss_bg"):
            v = np.array([r[name] for r in train])
            s = np.array([r["step"] for r in train])
            pre = float(v[s <= peak].mean()) if (s <= peak).any() else float("nan")
            post = float(v[s > peak].mean()) if (s > peak).any() else float("nan")
            print(f"{name}: mean before peak {pre:.5f}, after {post:.5f} "
                  f"({'+' if post > pre else ''}{(post - pre) / max(pre, 1e-12) * 100:.0f}%)")


if __name__ == "__main__":
    main()
