#!/usr/bin/env bash
# Round-5 reference-operating-point runs (VERDICT r4 ask #5): the reference
# ships EPOCHS=100_000 (reference experiments/run.py:114); every quality
# number so far stops at 30k. Run the two production recipes to the full
# 100k horizon on both scene classes, logging the eval trajectory densely
# (i_testset=5000 -> 20 points) so the r3 drift story (argmax-target noise
# degrades late evals; keep_best recovers) is measured AT the reference
# horizon, not extrapolated.
#
#   arm A: depth-net 100k against the frozen 20k NeRF pretrain (the
#          recommended recipe, just 10x longer)
#   arm B: warm-joint 100k from scratch (2k depth warmup)
#
# then render best checkpoints at uniform-64/128 + full, testskip=1.
# Chip budget: ~2h on one v5e via the tunnel.
set -uo pipefail
cd "$(dirname "$0")/.."

run_scene () {  # $1 = scene (example | example_hard)
  local DS=$1
  local NERF=logs/${DS}_nerf/020000.npz
  if [ ! -f "$NERF" ]; then
    echo "== [$DS] NeRF pretrain missing; training 20k"
    python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode nerf \
      --n_iters 20000 --mlp_impl pallas --precision high --seed 0 \
      -ip 2000 --testskip 1
  fi

  echo "== [$DS] arm A: depth-net 100k (frozen pretrain)"
  local DNBASE=logs/r5_100k_depth_${DS}
  python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode depth_net \
    -m recommended_depth_net_module --n_iters 100000 --mlp_impl pallas \
    --ft_path "$NERF" --seed 0 --basedir "$DNBASE" -ip 5000 \
    --i_testset 5000 --testskip 1
  local DN
  DN=$(ls "$DNBASE"/${DS}_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$DN" ] || DN=$(ls "$DNBASE"/${DS}_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)

  echo "== [$DS] arm B: warm-joint 100k from scratch"
  local JBASE=logs/r5_100k_joint_${DS}
  python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode joint \
    -m recommended_depth_net_module --n_iters 100000 --mlp_impl pallas \
    --precision high --seed 0 --basedir "$JBASE" -ip 5000 \
    --i_testset 5000 --testskip 1 --joint_depth_warmup 2000
  local JCKPT JBEST
  JCKPT=$(ls "$JBASE"/${DS}_nerf/0*.npz 2>/dev/null | sort | tail -1)
  JBEST=$(ls "$JBASE"/${DS}_nerf/best/*.npz 2>/dev/null | sort | tail -1)
  [ -n "$JBEST" ] && JCKPT="$JBEST"

  echo "== [$DS] renders (arm A: $NERF + $DN | arm B: $JCKPT)"
  local TAG CELL NCK DCK
  for ARM in depth joint; do
    if [ "$ARM" = depth ]; then NCK=$NERF; DCK=$DN; else NCK=$JCKPT; DCK=$JCKPT; fi
    [ -n "$DCK" ] || { echo "SKIP $ARM renders: no ckpt"; continue; }
    for CELL in "uniform 64" "uniform 128"; do
      set -- $CELL
      python -m nerf_sampling_tpu.experiments.render -d "$DS" -rt --testskip 1 \
        --ft_path "$NCK" --depth_net_path "$DCK" \
        --basedir "logs/r5/render_100k_${ARM}_${DS}_$1_$2" \
        --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
    done
    python -m nerf_sampling_tpu.experiments.render -d "$DS" -rt -nf --testskip 1 \
      --ft_path "$NCK" --depth_net_path "$DCK" \
      --basedir "logs/r5/render_100k_${ARM}_${DS}_full" --mlp_impl pallas
  done
}

run_scene example
run_scene example_hard

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r5/render_100k_* --include=psnr.txt -A2 || true
echo done
