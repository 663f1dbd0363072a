#!/usr/bin/env bash
# Round-4 joint fine-tune quality evidence (VERDICT r3 ask #5b, completed
# form). The from-scratch joint A/B (scripts/r4_joint_ab.sh) showed the
# depth net collapses early and never recovers (depth loss flat ~2.2,
# depth renders ~6.6 dB) while the NeRF co-trains fine (29.5 dB full
# render) — so the production-relevant joint recipe is FINE-TUNING:
# start joint training from the sequential arm's 20k NeRF pretrain and
# let both nets move. A 2.5k-step probe reached 27.33 dB (gaussian/64
# in-train eval); this run gives the budget-matched comparison against
# the sequential depth-only 10k arm (RESULTS.md round-3 evidence).
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=logs/r4_joint_ft10k
# n_iters is the ABSOLUTE iteration cap and the reloaded pretrain starts
# at 20000, so 30000 = 10k joint steps (budget-matched to the sequential
# depth-only 10k arm).
python -m nerf_sampling_tpu.experiments.run -d example --mode joint \
  -m recommended_depth_net_module --n_iters 30000 --mlp_impl pallas \
  --precision high --seed 0 --basedir "$BASE" -ip 250 --testskip 1 \
  --ft_path logs/example_nerf/020000.npz

CKPT=$(ls "$BASE"/example_nerf/0*.npz 2>/dev/null | sort | tail -1)
BEST=$(ls "$BASE"/example_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$BEST" ] && CKPT="$BEST"
if [ -z "$CKPT" ]; then
  echo "FATAL: no joint-ft checkpoint under $BASE/example_nerf" >&2
  exit 1
fi
echo "== joint-ft renders with $CKPT (testskip=1)"
for CELL in "uniform 64" "uniform 128"; do
  set -- $CELL
  python -m nerf_sampling_tpu.experiments.render -d example -rt --testskip 1 \
    --ft_path "$CKPT" --depth_net_path "$CKPT" \
    --basedir "logs/r4/render_joint_ft_$1_$2" \
    --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
done
python -m nerf_sampling_tpu.experiments.render -d example -rt -nf --testskip 1 \
  --ft_path "$CKPT" --depth_net_path "$CKPT" \
  --basedir "logs/r4/render_joint_ft_full" --mlp_impl pallas

echo "== summary (avg PSNR per render)"
grep -r "Avg of" logs/r4/render_joint_ft_* --include=psnr.txt -A2 || true
echo done
