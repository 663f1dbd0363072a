#!/usr/bin/env bash
# Round-5 drift measurement at the reference horizon (VERDICT r4 ask #5,
# parity-objective half): 100k-iter depth-net runs with the EXACT
# reference loss (bg_depth_loss_weight=1.0, Trainer.py:537) + keep_best,
# on both scene classes, logging the eval trajectory every 5k. The r3
# drift diagnosis predicted the background-argmax noise term degrades
# late evals; this measures it at the EPOCHS=100_000 the reference ships
# (reference experiments/run.py:114) and quantifies what keep_best
# recovers. Complements scripts/r5_100k.sh (same horizon, recommended
# fg-masked recipe).
set -uo pipefail
cd "$(dirname "$0")/.."

for DS in example example_hard; do
  NERF=logs/${DS}_nerf/020000.npz
  if [ ! -f "$NERF" ]; then
    echo "FATAL: missing NeRF pretrain $NERF (run scripts/r5_100k.sh first)" >&2
    exit 1
  fi
  echo "== [$DS] parity-objective depth-net 100k (frozen pretrain)"
  python -m nerf_sampling_tpu.experiments.run -d "$DS" --mode depth_net \
    -m parity_horizon_module --n_iters 100000 --mlp_impl pallas \
    --ft_path "$NERF" --seed 0 --basedir "logs/r5_100k_parity_${DS}" \
    -ip 5000 --testskip 1
done

echo "== eval trajectories"
for DS in example example_hard; do
  python scripts/r5_traj_summary.py "logs/r5_100k_parity_${DS}/${DS}_depth_net"
done
echo done
