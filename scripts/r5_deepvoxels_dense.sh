#!/usr/bin/env bash
# Round-5 follow-up: the 30-view DeepVoxels-format run converged its NeRF
# but the depth net plateaued (depth loss 0.12-0.15) — the round-2
# origin-tower memorization signature (per-view-constant ray origins let
# the origin tower memorize view-indexed depth; 100 views fixed it on
# blender). This re-generates the scene at 100 hemisphere training views
# and reruns the identical recipe to test that attribution.
set -uo pipefail
cd "$(dirname "$0")/.."

python - <<'PYEOF'
import shutil
from nerf_sampling_tpu.data.example import generate_example_deepvoxels_dataset
d = "nerf_sampling_tpu/dataset/example_deepvoxels"
shutil.rmtree(d, ignore_errors=True)
generate_example_deepvoxels_dataset(d, n_train=100)
print("regenerated", d, "with n_train=100")
PYEOF

BASE=logs/r5_deepvoxels100
NERF=$BASE/example_deepvoxels_nerf/020000.npz
echo "== [deepvoxels100] NeRF pretrain (20k)"
if [ ! -f "$NERF" ]; then
  python -m nerf_sampling_tpu.experiments.run -d example_deepvoxels --mode nerf \
    -m deepvoxels_depth_net_module --n_iters 20000 --mlp_impl pallas \
    --precision high --seed 0 --basedir "$BASE" -ip 2000 --i_testset 5000
fi
BESTN=$(ls "$BASE"/example_deepvoxels_nerf/best/*.npz 2>/dev/null | sort | tail -1)
[ -n "$BESTN" ] && NERF=$BESTN

echo "== [deepvoxels100] depth-net vs frozen NeRF (10k)"
python -m nerf_sampling_tpu.experiments.run -d example_deepvoxels --mode depth_net \
  -m deepvoxels_depth_net_module --n_iters 10000 --mlp_impl pallas \
  --ft_path "$NERF" --seed 0 --basedir "$BASE" -ip 1000
DN=$(ls "$BASE"/example_deepvoxels_depth_net/best/depth_*.npz 2>/dev/null | sort | tail -1)
[ -n "$DN" ] || DN=$(ls "$BASE"/example_deepvoxels_depth_net/depth_*.npz 2>/dev/null | sort | tail -1)
[ -n "$DN" ] || { echo "FATAL: no depth ckpt" >&2; exit 1; }

echo "== [deepvoxels100] renders: $NERF + $DN"
for CELL in "uniform 64" "uniform 128"; do
  set -- $CELL
  python -m nerf_sampling_tpu.experiments.render -d example_deepvoxels -rt \
    -m deepvoxels_depth_net_module --ft_path "$NERF" --depth_net_path "$DN" \
    --basedir "logs/r5/render_deepvoxels100_$1_$2" \
    --n_samples "$2" --distance 1.0 --sampling_mode "$1" --mlp_impl pallas
done
python -m nerf_sampling_tpu.experiments.render -d example_deepvoxels -rt -nf \
  -m deepvoxels_depth_net_module --ft_path "$NERF" --depth_net_path "$DN" \
  --basedir "logs/r5/render_deepvoxels100_full" --mlp_impl pallas

echo "== summary"
grep -r "Avg of" logs/r5/render_deepvoxels100_* --include=psnr.txt -A2 || true
echo done
