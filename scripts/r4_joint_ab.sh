#!/usr/bin/env bash
# Round-4 joint-vs-sequential quality evidence (VERDICT r3 ask #5b):
# train NeRF + DepthNet JOINTLY from scratch on the example scene (the
# reference's intended-but-broken capability, SURVEY.md defect #4) with
# the same recommended recipe the sequential arm used, then render the
# production cells — comparable against the sequential pretrain->depth
# numbers from scripts/e2e_round3.sh (RESULTS.md).
#
# Separate basedir: run.py names joint expdirs "<scene>_nerf", which
# would collide with the sequential arm's pretrain dir under logs/.
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=logs/r4_joint
python -m nerf_sampling_tpu.experiments.run -d example --mode joint \
  -m recommended_depth_net_module --n_iters 20000 --mlp_impl pallas \
  --precision high --seed 0 --basedir "$BASE" -ip 2000 --testskip 1

CKPT=$(ls "$BASE"/example_nerf/0*.npz 2>/dev/null | sort | tail -1)
BEST=$(ls "$BASE"/example_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$BEST" ] && CKPT="$BEST"
if [ -z "$CKPT" ]; then
  echo "FATAL: no joint checkpoint under $BASE/example_nerf" >&2
  exit 1
fi
echo "== joint renders with $CKPT (testskip=1)"
for CELL in "uniform 64" "uniform 128"; do
  set -- $CELL
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path "$CKPT" --depth_net_path "$CKPT" \
    --basedir "logs/r4/render_joint_$1_$2" \
    --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
done
python -m nerf_sampling_tpu.experiments.render -d example -rt -nf --testskip 1 \
  --ft_path "$CKPT" --depth_net_path "$CKPT" \
  --basedir "logs/r4/render_joint_full" --mlp_impl pallas

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r4 --include=psnr.txt -A2 || true
echo done
