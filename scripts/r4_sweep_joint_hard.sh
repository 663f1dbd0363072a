#!/usr/bin/env bash
# Full 32-cell reference sweep grid (render.py:237-261 mechanism:
# sampling_mode x n_samples x distance) on the HARD scene with the
# round-4 budget-matched warm-joint 30k checkpoint — the preferred
# recipe's production operating surface. Complements the r3 easy-scene
# sweep (logs/r3_bgw/sweep_fgonly) which used the sequential fg-only net.
#
# Chip budget: ~20-30 min (8 Mosaic compiles cached from prior runs,
# 32 renders at 400^2 over all 4 test views).
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=logs/r4_joint_warm_hard30/example_hard_nerf/best/027500.npz
if [ ! -f "$CKPT" ]; then
  CKPT=$(ls logs/r4_joint_warm_hard30/example_hard_nerf/best/*.npz 2>/dev/null | sort | tail -1)
fi
if [ -z "${CKPT:-}" ] || [ ! -f "$CKPT" ]; then
  echo "FATAL: no warm-joint 30k checkpoint under logs/r4_joint_warm_hard30" >&2
  exit 1
fi

echo "== [example_hard] 32-cell sweep with warm-joint 30k net: $CKPT"
python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -e --testskip 1 \
  --ft_path "$CKPT" --depth_net_path "$CKPT" \
  --basedir logs/r4/sweep_joint_hard --mlp_impl pallas

echo "== summary"
cat logs/r4/sweep_joint_hard/experiments/experiments_results.txt 2>/dev/null || true
echo done
