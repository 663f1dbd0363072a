#!/usr/bin/env bash
# Remainder of the round-5 100k-horizon chain, re-ordered by evidence
# value and run under the stall watchdog (the tunnel wedged two chain
# processes mid-init; see scripts/run_with_watchdog.py). Stages:
#   1. example_hard arm A: depth-net 100k vs frozen 20k pretrain
#   2. example_hard arm B: warm-joint 100k from scratch
#   3. parity-objective 100k (exact reference loss) on example
#   4. parity-objective 100k on example_hard
#   5. renders (hard arms + the lost example joint-full cell)
# Each stage is independent; a deadline kill between stages loses only
# the later, lower-priority stages.
set -uo pipefail
cd "$(dirname "$0")/.."

WD="python scripts/run_with_watchdog.py --tries 4 --"

echo "== stage 1: hard arm A (depth-net 100k)  $(date -u +%H:%M:%S)"
$WD python -m nerf_sampling_tpu.experiments.run -d example_hard \
  --mode depth_net -m recommended_depth_net_module --n_iters 100000 \
  --mlp_impl pallas --ft_path logs/example_hard_nerf/020000.npz --seed 0 \
  --basedir logs/r5_100k_depth_example_hard -ip 5000 --i_testset 5000 \
  --testskip 1

echo "== stage 2: hard arm B (warm-joint 100k)  $(date -u +%H:%M:%S)"
$WD python -m nerf_sampling_tpu.experiments.run -d example_hard \
  --mode joint -m recommended_depth_net_module --n_iters 100000 \
  --mlp_impl pallas --precision high --seed 0 \
  --basedir logs/r5_100k_joint_example_hard -ip 5000 --i_testset 5000 \
  --testskip 1 --joint_depth_warmup 2000

echo "== stage 3: parity-objective 100k, example  $(date -u +%H:%M:%S)"
$WD python -m nerf_sampling_tpu.experiments.run -d example --mode depth_net \
  -m parity_horizon_module --n_iters 100000 --mlp_impl pallas \
  --ft_path logs/example_nerf/020000.npz --seed 0 \
  --basedir logs/r5_100k_parity_example -ip 5000 --testskip 1

echo "== stage 4: parity-objective 100k, example_hard  $(date -u +%H:%M:%S)"
$WD python -m nerf_sampling_tpu.experiments.run -d example_hard \
  --mode depth_net -m parity_horizon_module --n_iters 100000 \
  --mlp_impl pallas --ft_path logs/example_hard_nerf/020000.npz --seed 0 \
  --basedir logs/r5_100k_parity_example_hard -ip 5000 --testskip 1

echo "== stage 5: renders  $(date -u +%H:%M:%S)"
best_of () {  # $1 = dir glob prefix for depth ckpts
  local B
  B=$(ls $1/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$B" ] || B=$(ls $1/depth_*.npz 2>/dev/null | sort | tail -1)
  echo "$B"
}

HNERF=logs/example_hard_nerf/020000.npz
HDN=$(best_of logs/r5_100k_depth_example_hard/example_hard_depth_net)
HJ=$(ls logs/r5_100k_joint_example_hard/example_hard_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$HJ" ] || HJ=$(ls logs/r5_100k_joint_example_hard/example_hard_nerf/0*.npz 2>/dev/null | sort | tail -1)

if [ -n "$HDN" ]; then
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt \
      --testskip 1 --ft_path "$HNERF" --depth_net_path "$HDN" \
      --basedir "logs/r5/render_100k_depth_example_hard_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -nf \
    --testskip 1 --ft_path "$HNERF" --depth_net_path "$HDN" \
    --basedir "logs/r5/render_100k_depth_example_hard_full" --mlp_impl pallas
fi
if [ -n "$HJ" ]; then
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt \
      --testskip 1 --ft_path "$HJ" --depth_net_path "$HJ" \
      --basedir "logs/r5/render_100k_joint_example_hard_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -nf \
    --testskip 1 --ft_path "$HJ" --depth_net_path "$HJ" \
    --basedir "logs/r5/render_100k_joint_example_hard_full" --mlp_impl pallas
fi
# the example joint-full cell lost to the first wedge
EJ=logs/r5_100k_joint_example/example_nerf/best/045000.npz
[ -f "$EJ" ] && $WD python -m nerf_sampling_tpu.experiments.render -d example \
  -rt -nf --testskip 1 --ft_path "$EJ" --depth_net_path "$EJ" \
  --basedir "logs/r5/render_100k_joint_example_full" --mlp_impl pallas

echo "== trajectories"
python scripts/r5_traj_summary.py \
  logs/r5_100k_depth_example_hard/example_hard_depth_net \
  logs/r5_100k_joint_example_hard/example_hard_nerf \
  logs/r5_100k_parity_example/example_depth_net \
  logs/r5_100k_parity_example_hard/example_hard_depth_net
echo "== render cells"
grep -r "Avg of" logs/r5/render_100k_* --include=psnr.txt -A1 || true
echo done
