#!/usr/bin/env bash
# Round-4 decisive int8 experiment (VERDICT r3 ask #1, applied where it
# aimed: the depth-train frozen-NeRF oracle, train/steps.py).
#
# The int8 quality study (scripts/probe_int8_quality.py) showed W8A8
# renders lose multiple dB because trained fine-model ACTIVATIONS don't
# fit 8 bits. But the depth-train oracle's consumed output is only
# argmax-weight max_z — an ORDINAL quantity plausibly robust to the
# radiometric loss. If so, int8 keeps its measured ~1.1-1.15x step win
# (scripts/probe_int8.py) with zero quality cost exactly where ~98% of
# depth-train FLOPs live.
#
# Arm A (bf16 oracle) = logs/example_depth_net, trained this round by
# scripts/e2e_round3.sh (recommended recipe, 10k iters).
# Arm B (this script): identical recipe/seed with mlp_impl=pallas_int8.
# Selection symmetry: arm B's in-train evals run int8 (deflated PSNR), so
# every periodic arm-B checkpoint is re-rendered post-hoc with arm A's
# BF16 eval protocol (gaussian/64/1.0) and the best is chosen on that —
# the same information arm A's keep_best had. Flagship uniform/64+128
# renders then run on the selected checkpoint.
set -uo pipefail
cd "$(dirname "$0")/.."

NERF=logs/example_nerf/020000.npz
BASE=logs/r4_int8_oracle
[ -f "$NERF" ] || { echo "FATAL: $NERF missing (run e2e_round3.sh first)" >&2; exit 1; }

if [ ! -f "$BASE/example_depth_net/depth_010000.npz" ]; then
  echo "== arm B: depth-net train, int8 frozen-NeRF oracle (10k)"
  python -m nerf_sampling_tpu.experiments.run -d example --mode depth_net \
    -m recommended_depth_net_module --n_iters 10000 --mlp_impl pallas_int8 \
    --ft_path "$NERF" --basedir "$BASE" -ip 1000 --testskip 1
fi

echo "== bf16 eval-protocol renders of every periodic arm-B checkpoint"
for CKPT in "$BASE"/example_depth_net/depth_0*.npz; do
  STEP=$(basename "$CKPT" .npz)
  OUT="logs/r4/int8_oracle_eval_${STEP}"
  [ -d "$OUT" ] && continue
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path "$NERF" --depth_net_path "$CKPT" --basedir "$OUT" \
    --n_samples 64 --distance 1.0 --sampling_mode gaussian --mlp_impl pallas
done

echo "== eval trajectory (bf16 gaussian/64/1.0; arm A in-train evals were 30.19/30.19/30.17/30.21)"
BEST_PSNR=0; BEST_CKPT=""
for CKPT in "$BASE"/example_depth_net/depth_0*.npz; do
  STEP=$(basename "$CKPT" .npz)
  TXT=$(ls logs/r4/int8_oracle_eval_${STEP}/*/renderonly_*/psnr.txt 2>/dev/null | tail -1)
  PSNR=$(grep -A1 "Avg of" "$TXT" | grep PSNR | awk '{print $2}')
  echo "$STEP: $PSNR"
  if awk "BEGIN{exit !($PSNR > $BEST_PSNR)}"; then BEST_PSNR=$PSNR; BEST_CKPT=$CKPT; fi
done
echo "best arm-B checkpoint: $BEST_CKPT ($BEST_PSNR)"

echo "== flagship renders on the selected checkpoint (bf16 kernels)"
for CELL in "uniform 64" "uniform 128"; do
  set -- $CELL
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path "$NERF" --depth_net_path "$BEST_CKPT" \
    --basedir "logs/r4/int8_oracle_best_$1_$2" \
    --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
done

echo "== summary"
grep -r "Avg of" logs/r4/int8_oracle_best_* --include=psnr.txt -A2 || true
echo done
