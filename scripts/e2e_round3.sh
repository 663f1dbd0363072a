#!/usr/bin/env bash
# Round-3 quality evidence, regenerable from scratch (the workspace loses
# gitignored logs/ between rounds). Reproduces the RESULTS.md round-3
# numbers: NeRF pretrain on both procedural scenes, the recommended
# fg-only depth-net recipe with eval-driven best-checkpoint capture, and
# the headline render cells. Outputs under logs/.
#
# Chip budget: ~40-60 min on one v5e via the tunnel (incl. evals).
# Optional: SWEEP=1 appends the full 32-cell reference sweep grid.
set -uo pipefail
cd "$(dirname "$0")/.."

for SCENE in example example_hard; do
  NERF=logs/${SCENE}_nerf/020000.npz
  if [ ! -f "$NERF" ]; then
    echo "== [$SCENE] NeRF pretrain (custom-VJP pallas, 20k, seed 0)"
    python -m nerf_sampling_tpu.experiments.run -d "$SCENE" --mode nerf \
      --n_iters 20000 --mlp_impl pallas --precision high --seed 0 \
      --basedir logs -ip 2000 --testskip 1
  fi

  echo "== [$SCENE] depth-net, recommended recipe (fg-only + keep_best, 10k)"
  python -m nerf_sampling_tpu.experiments.run -d "$SCENE" --mode depth_net \
    -m recommended_depth_net_module --n_iters 10000 --mlp_impl pallas \
    --ft_path "$NERF" --basedir logs -ip 1000 --testskip 1

  DN=$(ls logs/${SCENE}_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$DN" ] || DN=$(ls logs/${SCENE}_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)
  if [ -z "$DN" ]; then
    echo "FATAL: no depth-net checkpoint under logs/${SCENE}_depth_net" >&2
    exit 1
  fi
  echo "== [$SCENE] renders with $DN (testskip=1)"
  for CELL in "uniform 128" "uniform 64" "gaussian 128" "gaussian 64"; do
    set -- $CELL
    python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt --testskip 1 \
      --ft_path "$NERF" --depth_net_path "$DN" \
      --basedir "logs/r3/render_${SCENE}_$1_$2" \
      --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
  done
  echo "== [$SCENE] full hierarchical render (256 q/ray reference point)"
  python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt -nf --testskip 1 \
    --ft_path "$NERF" --depth_net_path "$DN" \
    --basedir "logs/r3/render_${SCENE}_full" --mlp_impl pallas

  if [ "${SWEEP:-0}" = "1" ]; then
    echo "== [$SCENE] full 32-cell sweep grid (reference render.py:237-261)"
    python -m nerf_sampling_tpu.experiments.render -d "$SCENE" -rt -e --testskip 1 \
      --ft_path "$NERF" --depth_net_path "$DN" \
      --basedir "logs/r3/sweep_${SCENE}" --mlp_impl pallas
  fi
done

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs --include=psnr.txt -A2 || true
echo done
