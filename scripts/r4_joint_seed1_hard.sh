#!/usr/bin/env bash
# Seed-robustness replication of the round-4 headline joint result
# (RESULTS.md "Budget-matched hard-scene run"): at seed 1, run BOTH
# 30k-step arms on example_hard —
#   sequential: 20k NeRF pretrain + 10k recommended depth-net recipe
#   warm-joint: 30k joint-from-scratch with a 2k depth warmup
# and render uniform-64 / uniform-128 / full for each. Seed 0 measured
# warm-joint +0.62/+0.61/+0.48 dB over sequential; this checks the sign
# holds on an independent seed (init + ray sampling + populate noise).
#
# Chip budget: ~80-100 min on one v5e via the tunnel (incl. evals).
set -uo pipefail
cd "$(dirname "$0")/.."

SEED=1
SEQ=logs/r4_seed${SEED}_seq
JNT=logs/r4_seed${SEED}_joint

echo "== [seq] NeRF pretrain (20k, seed $SEED)"
NERF=$SEQ/example_hard_nerf/020000.npz
if [ ! -f "$NERF" ]; then
  python -m nerf_sampling_tpu.experiments.run -d example_hard --mode nerf \
    --n_iters 20000 --mlp_impl pallas --precision high --seed $SEED \
    --basedir "$SEQ" -ip 2000 --testskip 1
fi

echo "== [seq] depth-net, recommended recipe (10k, seed $SEED)"
python -m nerf_sampling_tpu.experiments.run -d example_hard --mode depth_net \
  -m recommended_depth_net_module --n_iters 10000 --mlp_impl pallas \
  --ft_path "$NERF" --seed $SEED --basedir "$SEQ" -ip 1000 --testskip 1
DN=$(ls "$SEQ"/example_hard_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
[ -n "$DN" ] || DN=$(ls "$SEQ"/example_hard_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)
if [ -z "$DN" ]; then
  echo "FATAL: no depth-net checkpoint under $SEQ/example_hard_depth_net" >&2
  exit 1
fi

echo "== [joint] warm-joint from scratch (30k, warmup 2k, seed $SEED)"
python -m nerf_sampling_tpu.experiments.run -d example_hard --mode joint \
  -m recommended_depth_net_module --n_iters 30000 --mlp_impl pallas \
  --precision high --seed $SEED --basedir "$JNT" -ip 2000 --testskip 1 \
  --joint_depth_warmup 2000
JCKPT=$(ls "$JNT"/example_hard_nerf/0*.npz 2>/dev/null | sort | tail -1)
JBEST=$(ls "$JNT"/example_hard_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$JBEST" ] && JCKPT="$JBEST"
if [ -z "$JCKPT" ]; then
  echo "FATAL: no warm-joint checkpoint under $JNT/example_hard_nerf" >&2
  exit 1
fi

render_cells () {  # $1 = arm tag, $2 = nerf ckpt, $3 = depth ckpt
  local TAG=$1 NCK=$2 DCK=$3
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    python -m nerf_sampling_tpu.experiments.render -d example_hard -rt --testskip 1 \
      --ft_path "$NCK" --depth_net_path "$DCK" \
      --basedir "logs/r4/render_seed${SEED}_${TAG}_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -nf --testskip 1 \
    --ft_path "$NCK" --depth_net_path "$DCK" \
    --basedir "logs/r4/render_seed${SEED}_${TAG}_full" --mlp_impl pallas
}

echo "== [seq] renders with $NERF + $DN"
render_cells seq "$NERF" "$DN"
echo "== [joint] renders with $JCKPT"
render_cells joint "$JCKPT" "$JCKPT"

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r4/render_seed${SEED}_* --include=psnr.txt -A2 || true
echo done
