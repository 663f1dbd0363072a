#!/usr/bin/env bash
# Round-5 convergence on the remaining loader formats (closing VERDICT r4
# weak #3 beyond the LLFF ask): NeRF pretrain + depth-net + renders on the
# procedural LINEMOD-format scene (per-frame intrinsic_matrix, metadata
# near/far) and DeepVoxels-format scene (intrinsics.txt + pose dirs,
# hemisphere near/far) — every dataset loader then has a real PSNR, not
# just a 6-iter finiteness smoke.
set -uo pipefail
cd "$(dirname "$0")/.."

run_fmt () {  # $1 = dataset name, $2 = module
  local DS=$1 M=$2
  local BASE=logs/r5_${DS}
  local NERF=$BASE/${DS}_nerf/020000.npz
  echo "== [$DS] NeRF pretrain (20k)"
  if [ ! -f "$NERF" ]; then
    python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode nerf \
      -m "$M" --n_iters 20000 --mlp_impl pallas --precision high --seed 0 \
      --basedir "$BASE" -ip 2000 --i_testset 5000
  fi
  local BESTN
  BESTN=$(ls "$BASE"/${DS}_nerf/best/*.npz 2>/dev/null | sort | tail -1)
  [ -n "$BESTN" ] && NERF=$BESTN

  echo "== [$DS] depth-net vs frozen NeRF (10k)"
  python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode depth_net \
    -m "$M" --n_iters 10000 --mlp_impl pallas --ft_path "$NERF" --seed 0 \
    --basedir "$BASE" -ip 1000
  local DN
  DN=$(ls "$BASE"/${DS}_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$DN" ] || DN=$(ls "$BASE"/${DS}_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$DN" ] || { echo "FATAL: no depth ckpt for $DS" >&2; return 1; }

  echo "== [$DS] renders: $NERF + $DN"
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    python -m nerf_sampling_tpu.experiments.render -d "$DS" -rt \
      -m "$M" --ft_path "$NERF" --depth_net_path "$DN" \
      --basedir "logs/r5/render_${DS}_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  python -m nerf_sampling_tpu.experiments.render -d "$DS" -rt -nf \
    -m "$M" --ft_path "$NERF" --depth_net_path "$DN" \
    --basedir "logs/r5/render_${DS}_full" --mlp_impl pallas
}

run_fmt example_linemod linemod_depth_net_module || exit 1
run_fmt example_deepvoxels deepvoxels_depth_net_module || exit 1

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r5/render_example_linemod_* logs/r5/render_example_deepvoxels_* \
  --include=psnr.txt -A2 || true
echo done
