#!/usr/bin/env bash
# Round-2 quality evidence: multi-view (testskip=1) PSNR on both procedural
# scenes, depth-net retrained with the fused stochastic oracle, renders in
# every eval mode. Outputs under logs/r2/.
set -uo pipefail
cd "$(dirname "$0")/.."
R=logs/r2
NERF_EASY=logs/example_nerf/020000.npz   # round-1 pretrained NeRF (30.96 dB)

echo "== [example] depth-net retrain (fused oracle, 10k)"
python -m nerf_sampling_tpu.experiments.run -d example --mode depth_net \
  --n_iters 10000 --mlp_impl pallas --ft_path "$NERF_EASY" \
  --basedir $R -ip 2000 --testskip 1

DN=$R/example_depth_net/depth_010000.npz
echo "== [example] renders: uniform64, gaussian64, compare, full-nerf (testskip=1)"
python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
  --ft_path "$NERF_EASY" --depth_net_path "$DN" --basedir $R/render_uniform \
  --n_samples 64 --distance 1.0 --sampling_mode uniform
python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
  --ft_path "$NERF_EASY" --depth_net_path "$DN" --basedir $R/render_gauss \
  --n_samples 64 --distance 1.0 --sampling_mode gaussian
python -m nerf_sampling_tpu.experiments.render -d example -rt -nc --testskip 1 \
  --ft_path "$NERF_EASY" --depth_net_path "$DN" --basedir $R/render_compare \
  --n_samples 64 --distance 1.0 --sampling_mode uniform
python -m nerf_sampling_tpu.experiments.render -d example -rt -nf --testskip 1 \
  --ft_path "$NERF_EASY" --depth_net_path "$DN" --basedir $R/render_full

echo "== [example_hard] NeRF pretrain (custom-VJP pallas, 20k)"
python -m nerf_sampling_tpu.experiments.run -d example_hard --mode nerf \
  --n_iters 20000 --mlp_impl pallas --seed 0 --basedir $R -ip 2000 --testskip 1

NERF_HARD=$R/example_hard_nerf/020000.npz
echo "== [example_hard] depth-net train (fused oracle, 10k)"
python -m nerf_sampling_tpu.experiments.run -d example_hard --mode depth_net \
  --n_iters 10000 --mlp_impl pallas --ft_path "$NERF_HARD" \
  --basedir $R -ip 2000 --testskip 1

DNH=$R/example_hard_depth_net/depth_010000.npz
echo "== [example_hard] renders"
python -m nerf_sampling_tpu.experiments.render -d example_hard -rt --testskip 1 \
  --ft_path "$NERF_HARD" --depth_net_path "$DNH" --basedir $R/render_hard_uniform \
  --n_samples 64 --distance 1.0 --sampling_mode uniform
python -m nerf_sampling_tpu.experiments.render -d example_hard -rt -nf --testskip 1 \
  --ft_path "$NERF_HARD" --depth_net_path "$DNH" --basedir $R/render_hard_full

echo "== summary"
grep -r "Avg of" $R --include=psnr.txt -A2 || true
echo done
