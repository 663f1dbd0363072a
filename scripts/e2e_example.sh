#!/usr/bin/env bash
# Full workflow on the built-in example scene (zero external data):
# pretrain NeRF -> train DepthNet against it -> render all eval modes.
# Results land in logs/ and RESULTS.md documents the latest numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

NERF_ITERS=${NERF_ITERS:-20000}
DEPTH_ITERS=${DEPTH_ITERS:-10000}
PRECISION=${PRECISION:-default}   # bf16 MXU; use "highest" for fp32 parity

echo "== 1/4 pretrain NeRF (${NERF_ITERS} iters)"
python -m nerf_sampling_tpu.experiments.run -d example --mode nerf \
    --n_iters "$NERF_ITERS" --precision "$PRECISION" -ip 1000 --basedir logs

NERF_CKPT=$(ls logs/example_nerf/*.tar | sort | tail -1)
echo "== 2/4 train DepthNet against frozen $NERF_CKPT (${DEPTH_ITERS} iters)"
python -m nerf_sampling_tpu.experiments.run -d example --mode depth_net \
    --n_iters "$DEPTH_ITERS" --precision "$PRECISION" --mlp_impl pallas \
    --ft_path "$NERF_CKPT" -ip 1000 --basedir logs

DEPTH_CKPT=$(ls logs/example_depth_net/depth_*.npz | sort | tail -1)
echo "== 3/4 render test split: depth-net mode + compare mode + full-nerf"
for MODE_FLAGS in "" "-nc" "-nf"; do
    python -m nerf_sampling_tpu.experiments.render -d example -rt $MODE_FLAGS \
        --ft_path "$NERF_CKPT" --depth_net_path "$DEPTH_CKPT" \
        --basedir logs/render --mlp_impl pallas
done

echo "== 4/4 sweep grid (n_samples x distance x mode)"
python -m nerf_sampling_tpu.experiments.render -d example -e \
    --ft_path "$NERF_CKPT" --depth_net_path "$DEPTH_CKPT" \
    --basedir logs/render --mlp_impl pallas

echo "done; see logs/render/**/psnr.txt and experiments_results.txt"
