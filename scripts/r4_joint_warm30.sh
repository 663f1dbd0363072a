#!/usr/bin/env bash
# Budget-matched warm-joint on the EASY scene: 30k joint-from-scratch with
# a 2k depth warmup vs the 30k sequential recipe (20k NeRF + 10k depth).
# Companion to r4_joint_warm_hard30.sh, which showed warm-joint winning
# every render cell by +0.5-0.6 dB at equal budget on the hard scene.
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=logs/r4_joint_warm30
python -m nerf_sampling_tpu.experiments.run -d example --mode joint \
  -m recommended_depth_net_module --n_iters 30000 --mlp_impl pallas \
  --precision high --seed 0 --basedir "$BASE" -ip 2000 --testskip 1 \
  --joint_depth_warmup 2000

CKPT=$(ls "$BASE"/example_nerf/0*.npz 2>/dev/null | sort | tail -1)
BEST=$(ls "$BASE"/example_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$BEST" ] && CKPT="$BEST"
if [ -z "$CKPT" ]; then
  echo "FATAL: no warm-joint checkpoint under $BASE/example_nerf" >&2
  exit 1
fi
echo "== warm-joint renders with $CKPT (testskip=1)"
for CELL in "uniform 64" "uniform 128"; do
  set -- $CELL
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path "$CKPT" --depth_net_path "$CKPT" \
    --basedir "logs/r4/render_joint_warm30_$1_$2" \
    --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
done
python -m nerf_sampling_tpu.experiments.render -d example -rt -nf --testskip 1 \
  --ft_path "$CKPT" --depth_net_path "$CKPT" \
  --basedir "logs/r4/render_joint_warm30_full" --mlp_impl pallas

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r4/render_joint_warm30_* --include=psnr.txt -A2 || true
echo done
