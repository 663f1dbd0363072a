#!/usr/bin/env bash
# int8 (W8A8) render PSNR on the TRAINED fields, both scenes — the
# acceptance measurement for the mlp_impl="pallas_int8" mode (VERDICT r3
# ask #1). bf16 counterparts come from scripts/e2e_round3.sh's renders
# (logs/r3/...); this adds the same cells through the int8 kernels.
set -uo pipefail
cd "$(dirname "$0")/.."

for SCENE in example example_hard; do
  NERF=logs/${SCENE}_nerf/020000.npz
  DN=$(ls logs/${SCENE}_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$DN" ] || DN=$(ls logs/${SCENE}_depth_net/depth_*.npz | sort | tail -1)
  for CELL in "uniform 64" "uniform 128"; do
    set -- $CELL
    python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt --testskip 1 \
      --ft_path "$NERF" --depth_net_path "$DN" \
      --basedir "logs/r4/int8_${SCENE}_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" \
      --mlp_impl pallas_int8
  done
  python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt -nf --testskip 1 \
    --ft_path "$NERF" --depth_net_path "$DN" \
    --basedir "logs/r4/int8_${SCENE}_full" --mlp_impl pallas_int8
done

echo "== int8 renders (avg PSNR)"
grep -r "Avg of" logs/r4 --include=psnr.txt -A2 | grep -A2 int8 || true
echo done
