#!/usr/bin/env bash
# Round-5 final chip chain: the remaining 100k-horizon evidence, re-ordered
# to fit the end-of-round chip budget after the workspace reset lost the
# uncommitted logs/ checkpoints. Stages (independent; a deadline kill
# between stages loses only later, lower-value ones):
#   1. example_hard NeRF pretrain 20k (prerequisite, lost with logs/)
#   2. hard arm A: depth-net 100k vs the frozen pretrain (recommended obj)
#   3. renders for arm A (uniform 64/128 + full hierarchical)
#   4. parity-objective (exact reference loss, bg weight 1.0) 100k on hard
#   5. example NeRF pretrain 20k + parity-objective 100k on example
# The hard-scene warm-joint 100k arm (~40 min of chip alone) is cut to
# budget: its coverage is the budget-matched 30k hard A/B (round 4) plus
# the easy-scene 100k joint arm — noted in RESULTS.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs/r5

WD="python scripts/run_with_watchdog.py --tries 3 --"

echo "== stage 1: example_hard NeRF pretrain 20k  $(date -u +%H:%M:%S)"
HNERF=logs/example_hard_nerf/020000.npz
[ -f "$HNERF" ] || $WD python -m nerf_sampling_tpu.experiments.run \
  -d example_hard --mode nerf --n_iters 20000 --mlp_impl pallas \
  --precision high --seed 0 -ip 2000 --testskip 1

echo "== stage 2: hard arm A depth-net 100k  $(date -u +%H:%M:%S)"
DNBASE=logs/r5_100k_depth_example_hard
$WD python -m nerf_sampling_tpu.experiments.run -d example_hard \
  --mode depth_net -m recommended_depth_net_module --n_iters 100000 \
  --mlp_impl pallas --ft_path "$HNERF" --seed 0 --basedir "$DNBASE" \
  -ip 5000 --i_testset 5000 --testskip 1

DN=$(ls "$DNBASE"/example_hard_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
[ -n "$DN" ] || DN=$(ls "$DNBASE"/example_hard_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)

echo "== stage 3: arm A renders  $(date -u +%H:%M:%S)"
if [ -n "$DN" ]; then
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt \
      --testskip 1 --ft_path "$HNERF" --depth_net_path "$DN" \
      --basedir "logs/r5/render_100k_depth_example_hard_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  $WD python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -nf \
    --testskip 1 --ft_path "$HNERF" --depth_net_path "$DN" \
    --basedir "logs/r5/render_100k_depth_example_hard_full" --mlp_impl pallas
fi

echo "== stage 4: parity-objective 100k, example_hard  $(date -u +%H:%M:%S)"
$WD python -m nerf_sampling_tpu.experiments.run -d example_hard \
  --mode depth_net -m parity_horizon_module --n_iters 100000 \
  --mlp_impl pallas --ft_path "$HNERF" --seed 0 \
  --basedir logs/r5_100k_parity_example_hard -ip 5000 --testskip 1

echo "== stage 5: example pretrain + parity-objective 100k  $(date -u +%H:%M:%S)"
ENERF=logs/example_nerf/020000.npz
[ -f "$ENERF" ] || $WD python -m nerf_sampling_tpu.experiments.run \
  -d example --mode nerf --n_iters 20000 --mlp_impl pallas \
  --precision high --seed 0 -ip 2000 --testskip 1
$WD python -m nerf_sampling_tpu.experiments.run -d example --mode depth_net \
  -m parity_horizon_module --n_iters 100000 --mlp_impl pallas \
  --ft_path "$ENERF" --seed 0 --basedir logs/r5_100k_parity_example \
  -ip 5000 --testskip 1

echo "== trajectories  $(date -u +%H:%M:%S)"
python scripts/r5_traj_summary.py \
  "$DNBASE"/example_hard_depth_net \
  logs/r5_100k_parity_example_hard/example_hard_depth_net \
  logs/r5_100k_parity_example/example_depth_net || true
echo "== render cells"
grep -r "Avg of" logs/r5/render_100k_depth_example_hard* -A1 2>/dev/null || true
echo "CHAIN DONE $(date -u +%H:%M:%S)"
