#!/bin/bash
# Flagship-geometry training recipe — the README "Trained accuracy" runs,
# reproducible end to end (reference protocol: scripts/train.py +
# scripts/eval_model.py, /root/reference/scripts/eval_model.py:215-232).
#
# Generates the 16-seq/800-frame synthetic valve set, trains the default
# 24.95M-param KeypointNet (features 128) with the device-resident data
# path, evaluates learned-mode 3D accuracy over the full val split, and
# archives the durable evidence (metrics.jsonl, TensorBoard events, eval
# summary JSON, exact hparams) into results/flagship/<name>/.
#
# Usage: scripts/flagship_recipe.sh <name> [extra train.py flags...]
#   scripts/flagship_recipe.sh runA --pool 500 --epochs 50
#   scripts/flagship_recipe.sh runB --pool 1000 --epochs 120
set -euo pipefail
cd "$(dirname "$0")/.."

NAME=${1:?usage: flagship_recipe.sh <name> [train flags]}
shift
WORK=${OKT_FLAGSHIP_WORK:-/tmp/flagship5}
OUT=results/flagship/$NAME
mkdir -p "$OUT"

if [ ! -d "$WORK/data/train" ]; then
  python - <<PY
from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree
make_synthetic_dataset_tree("$WORK/data", "config/calibration.yaml", [1, 3],
                            n_train=16, n_val=2, n_frames=50, n_objects=2)
PY
fi

echo "=== train ($NAME) $*"
python scripts/train.py --train "$WORK/data/train" --val "$WORK/data/val" \
  --keypoints config/valve.json --batch-size 8 --lr 4e-3 --features 128 \
  --fp16 --seed 1 --ckpt-every 10 --tensorboard \
  --out "$WORK/$NAME" "$@" 2>&1 | tee "$OUT/train.log" | grep -E "\[val\]|epoch=|best" | tail -40

echo "=== eval ($NAME)"
python scripts/eval_model.py "$WORK/data/val" -m "$WORK/$NAME/export" \
  --keypoints config/valve.json --fast --batch 8 \
  --json "$OUT/eval.json" 2>&1 | tee "$OUT/eval.log" | tail -10

cp "$WORK/$NAME/metrics.jsonl" "$OUT/" 2>/dev/null || true
cp "$WORK/$NAME/hparams.json" "$OUT/" 2>/dev/null || true
cp "$WORK/$NAME"/events.out.tfevents.* "$OUT/" 2>/dev/null || true
echo "=== archived to $OUT"
