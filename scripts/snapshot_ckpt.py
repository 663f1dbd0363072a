"""Snapshot a trained depth-net checkpoint as committable bench evidence.

Strips the optimizer state from logs/<scene>_depth_net's best checkpoint
(params = coarse + fine NeRF + DepthNet, reference ckpt layout
nerf_utils.py:451-467), stores the params in fp16 (halves the committed
size; the eval kernels compute in bf16, so the storage rounding is below
render noise — the recorded expected PSNR is computed FROM the stripped
file so the bench assertion is self-consistent), and records the
production-cell render PSNR in evidence/ckpt/expected.json for bench.py's
production arm to assert against.

Run on a chip-attached host after scripts/e2e_round3.sh:
    python scripts/snapshot_ckpt.py [scene]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _DIR)

OUT_DIR = os.path.join(_DIR, "evidence", "ckpt")


def strip_checkpoint(src: str, dst: str) -> None:
    d = np.load(src)
    out = {}
    for k in d.files:
        if k.startswith(("tree:['opt_state']", "tree:['depth_opt_state']")):
            # joint-mode checkpoints carry BOTH optimizers' moments; neither
            # belongs in committed evidence (params-only snapshots)
            continue
        a = d[k]
        out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"{src} -> {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")


def main() -> None:
    scene = sys.argv[1] if len(sys.argv) > 1 else "example"
    best = sorted(glob.glob(f"logs/{scene}_depth_net/best/depth_*.npz"))
    if not best:
        best = sorted(glob.glob(f"logs/{scene}_depth_net/depth_*.npz"))
    if not best:
        sys.exit(f"no depth checkpoint under logs/{scene}_depth_net")
    src = best[-1]
    dst = os.path.join(OUT_DIR, f"{scene}_depth.npz")
    strip_checkpoint(src, dst)

    # record the production-cell PSNR from the stripped file (bench asserts
    # against this; import here so the strip works without a chip)
    from bench import production_render_setup, psnr_of_render

    setup = production_render_setup(dst)
    psnr, img_std = psnr_of_render(setup)
    exp_path = os.path.join(OUT_DIR, "expected.json")
    expected = {}
    if os.path.exists(exp_path):
        expected = json.load(open(exp_path))
    expected[scene] = {
        "psnr_view0": round(float(psnr), 3),
        "img_std": round(float(img_std), 4),
        "cell": "depth_net uniform/64/1.0, test view 0, 400^2, bf16",
        "source_ckpt": src,
    }
    with open(exp_path, "w") as f:
        json.dump(expected, f, indent=2)
    print(f"expected.json: {expected[scene]}")


if __name__ == "__main__":
    main()
