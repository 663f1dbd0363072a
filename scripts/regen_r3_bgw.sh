#!/usr/bin/env bash
# Regenerate the round-3 bg-weight A/B evidence + the 32-cell sweep
# grids (the workspace loses gitignored logs/ between rounds; run this
# AFTER scripts/e2e_round3.sh so the NeRF + depth-net checkpoints
# exist). Reproduces the RESULTS.md artifacts:
#   logs/r3/sweep_{example,example_hard}/experiments/experiments_results.txt
#   logs/r3_bgw/{example,example_hard}_ab.json   (A/B trajectories)
#   logs/r3_bgw/render_g{128,64,32}, hard_render_g{128,64}
#   logs/r3_bgw/sweep_fgonly/experiments/experiments_results.txt
# Chip budget: ~1.5-2h on one v5e via the tunnel.
set -uo pipefail
cd "$(dirname "$0")/.."

dn_for() { # newest best/ checkpoint, falling back to the flat dir
  local d=$1
  local ckpt
  ckpt=$(ls "$d"/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$ckpt" ] || ckpt=$(ls "$d"/depth_*.npz 2>/dev/null | sort | tail -1)
  echo "$ckpt"
}

# 1. Full 32-cell reference sweep grids with the recommended-recipe nets
for SCENE in example example_hard; do
  NERF=logs/${SCENE}_nerf/020000.npz
  DN=$(dn_for logs/${SCENE}_depth_net)
  if [ -z "$DN" ] || [ ! -f "$NERF" ]; then
    echo "FATAL: missing checkpoints for $SCENE (run e2e_round3.sh first)" >&2
    exit 1
  fi
  if [ ! -f "logs/r3/sweep_${SCENE}/experiments/experiments_results.txt" ]; then
    echo "== [$SCENE] full 32-cell sweep grid (reference render.py:237-261)"
    python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt -e --testskip 1 \
      --ft_path "$NERF" --depth_net_path "$DN" \
      --basedir "logs/r3/sweep_${SCENE}" --mlp_impl pallas
  fi
done

# 2. bg_depth_loss_weight A/B, 30k arms, both scenes (writes metrics +
#    keep_best checkpoints under logs/r3_bgw/<scene>_bgw_{1,0})
mkdir -p logs/r3_bgw
for SCENE in example_hard example; do
  if [ ! -f "logs/r3_bgw/${SCENE}_ab.json" ]; then
    echo "== [$SCENE] bg-weight A/B (2 x 30k iters)"
    python scripts/r3_bg_weight_ab.py "$SCENE" 30000 | tee /tmp/ab_${SCENE}.out
    tail -1 /tmp/ab_${SCENE}.out > "logs/r3_bgw/${SCENE}_ab.json"
  fi
done
# 3. Render the fg-only (bgw=0) best checkpoints through the reference
#    sweep cells used in RESULTS.md
BEST_EX=$(dn_for logs/r3_bgw/example_bgw_0)
BEST_HARD=$(dn_for logs/r3_bgw/example_hard_bgw_0)
for N in 128 64 32; do
  echo "== [example] fg-only render gaussian/$N/1.0"
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path logs/example_nerf/020000.npz --depth_net_path "$BEST_EX" \
    --basedir "logs/r3_bgw/render_g${N}" \
    --n_samples "$N" --distance 1.0 --sampling_mode gaussian --mlp_impl pallas
done
for N in 128 64; do
  echo "== [example_hard] fg-only render gaussian/$N/1.0"
  python -m nerf_sampling_tpu.experiments.render -d example_hard -rt --testskip 1 \
    --ft_path logs/example_hard_nerf/020000.npz --depth_net_path "$BEST_HARD" \
    --basedir "logs/r3_bgw/hard_render_g${N}" \
    --n_samples "$N" --distance 1.0 --sampling_mode gaussian --mlp_impl pallas
done

# 4. Full 32-cell sweep with the fg-only example net
echo "== [example] fg-only 32-cell sweep grid"
python -m nerf_sampling_tpu.experiments.render -d example -rt -e --testskip 1 \
  --ft_path logs/example_nerf/020000.npz --depth_net_path "$BEST_EX" \
  --basedir logs/r3_bgw/sweep_fgonly --mlp_impl pallas

echo "== summary"
grep -r "Avg of" logs/r3_bgw logs/r3/sweep_* --include=psnr.txt -A2 || true
cat logs/r3/sweep_*/experiments/experiments_results.txt 2>/dev/null || true
echo done
