#!/bin/bash
# One-command VisDrone pipeline: the moment real data is mounted, this
# measures AP parity against the reference with zero new code.
#
#   bash scripts/visdrone_e2e.sh <train_root> <val_root> <workdir>
#   bash scripts/visdrone_e2e.sh --synthetic <workdir>      # CI dry-run
#
# <train_root>/<val_root> use the stock VisDrone layout the reference's
# converters consume (images/ + annotations/ *.txt); --synthetic
# fabricates that layout with tiny colored-box frames and switches to
# smoke-scale models/epochs so the identical command flow dry-runs on
# CPU in minutes (exercised by full_workflow_check.sh).
#
# Stages (the reference's VisDrone recipe, README.md "Getting Started"):
#   1. VisDrone->COCO conversion (train + val)
#   2. coarse detector training (YOLOX-s @640; yolox-ufp configs)
#   3. UFP dataset build from coarse detections (IoF>0.9 re-projection)
#   4. MP-Det training on UFP mosaics (R50 GFL+MPHead, 1x schedule)
#   5. two-stage UFPMP eval on val (COCOeval maxDets=[10,100,500])
#
# Overrides: GLSDET_E2E_COARSE_OPTS / GLSDET_E2E_MP_OPTS append
# --cfg-options entries (e.g. 'train.epochs=50 data.batch_size=16');
# GLSDET_E2E_EVAL_OPTS appends to the eval's --first-options.
# North star (BASELINE.md): AP@[.5:.95] parity with the reference +-0.3
# (the UFPMP-Det paper reports ~36.6 AP on VisDrone-val).
set -e
cd "$(dirname "$0")/.."

SYNTH=0
if [ "$1" = "--synthetic" ]; then
  SYNTH=1
  WD=${2:?usage: visdrone_e2e.sh --synthetic <workdir>}
  rm -rf "$WD"; mkdir -p "$WD"
  TRAIN_ROOT="$WD/VisDrone2019-DET-train"
  VAL_ROOT="$WD/VisDrone2019-DET-val"
  python - "$TRAIN_ROOT" "$VAL_ROOT" <<'PYEOF'
import os, sys
import numpy as np, cv2

COLORS = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]
for root, n, seed in ((sys.argv[1], 48, 0), (sys.argv[2], 8, 1)):
    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/annotations", exist_ok=True)
    rs = np.random.RandomState(seed)
    for i in range(n):
        img = rs.randint(20, 60, (384, 640, 3)).astype(np.uint8)
        lines = []
        for _ in range(rs.randint(4, 9)):
            w, h = rs.randint(14, 36), rs.randint(14, 36)
            x, y = rs.randint(0, 640 - w), rs.randint(0, 384 - h)
            c = rs.randint(0, 4)
            img[y:y + h, x:x + w] = COLORS[c]
            lines.append(f"{x},{y},{w},{h},1,{c + 1},0,0")
        cv2.imwrite(f"{root}/images/{i:04d}.jpg", img)
        open(f"{root}/annotations/{i:04d}.txt", "w").write(
            "\n".join(lines))
    print(f"synthetic VisDrone layout at {root}: {n} images")
PYEOF
  # smoke-scale models/schedules (same scale the workflow check trains
  # at — a shorter coarse run detects nothing and UFP packs 0 images);
  # the lowered coarse_score_thr rides COARSE_MODEL so the UFP build
  # stage sees it too
  COARSE_MODEL="model.phi=nano model.dtype=float32 data.img_hw=(256,256) \
    eval.coarse_score_thr=0.05"
  COARSE_SCHED="data.batch_size=4 data.max_gt=20 data.mosaic=False \
    data.mixup=False data.hsv=False data.flip_prob=0.0 data.num_workers=2 \
    train.epochs=60 train.base_lr=0.002 train.warmup_epochs=2 \
    train.num_last_epochs=5 train.ckpt_interval=60 train.log_interval=24"
  COARSE_EPOCH=60
  MP_MODEL="model.depth=18 model.dtype=float32 data.img_hw=(256,256)"
  MP_SCHED="data.batch_size=2 data.max_gt=30 data.num_workers=2 \
    train.epochs=4 train.base_lr=0.002 train.ckpt_interval=4 \
    train.log_interval=24 train.ot_interval=40"
  MP_EPOCH=4
  EVAL_OPTS="model.phi=nano model.dtype=float32 data.img_hw=(256,256) \
    eval.coarse_score_thr=0.05"
  EVAL_SECOND="model.depth=18 model.dtype=float32"
else
  TRAIN_ROOT=${1:?usage: visdrone_e2e.sh <train_root> <val_root> <workdir>}
  VAL_ROOT=${2:?usage: visdrone_e2e.sh <train_root> <val_root> <workdir>}
  WD=${3:?usage: visdrone_e2e.sh <train_root> <val_root> <workdir>}
  mkdir -p "$WD"
  # the real recipe: named configs carry the reference hyperparameters
  COARSE_MODEL=""
  COARSE_SCHED=""
  COARSE_EPOCH=$(python -c "
from glsdet_tpu.config import get_config
print(get_config('coarse_det').train.epochs)")
  MP_MODEL=""
  MP_SCHED=""
  MP_EPOCH=$(python -c "
from glsdet_tpu.config import get_config
print(get_config('mp_det_res50').train.epochs)")
  EVAL_OPTS=""
  EVAL_SECOND=""
fi

echo "=== stage 1: VisDrone -> COCO ==="
python tools/convert_datasets.py visdrone "$TRAIN_ROOT" "$WD/train.json"
python tools/convert_datasets.py visdrone "$VAL_ROOT" "$WD/val.json"

echo "=== stage 2: train coarse detector ==="
python tools/train.py coarse_det \
  --ann "$WD/train.json" --img-root "$TRAIN_ROOT/images" \
  --work-dir "$WD/coarse" \
  --cfg-options $COARSE_MODEL $COARSE_SCHED $GLSDET_E2E_COARSE_OPTS

echo "=== stage 3: build UFP dataset ==="
python tools/build_ufp_dataset.py coarse_det "$WD/coarse/epoch_$COARSE_EPOCH" \
  "$WD/train.json" "$TRAIN_ROOT/images" "$WD/ufp" \
  --cfg-options $COARSE_MODEL $GLSDET_E2E_COARSE_OPTS
# fail fast instead of training MP-Det on an empty mosaic set
python - "$WD/ufp/ufp_train.json" <<'PYEOF'
import json, sys
n = len(json.load(open(sys.argv[1]))["images"])
assert n > 0, "UFP build produced 0 mosaics — coarse model found nothing"
print(f"UFP dataset: {n} mosaics")
PYEOF

echo "=== stage 4: train MP-Det on UFP mosaics ==="
python tools/train.py mp_det_res50 \
  --ann "$WD/ufp/ufp_train.json" --img-root "$WD/ufp/images" \
  --work-dir "$WD/mpdet" \
  --cfg-options $MP_MODEL $MP_SCHED $GLSDET_E2E_MP_OPTS

echo "=== stage 5: two-stage eval on val ==="
python tools/ufpmp_det_eval.py \
  coarse_det "$WD/coarse/epoch_$COARSE_EPOCH" \
  mp_det_res50 "$WD/mpdet/epoch_$MP_EPOCH" \
  "$WD/val.json" "$VAL_ROOT/images" --out-json "$WD/val_dets.json" \
  --first-options $EVAL_OPTS $GLSDET_E2E_EVAL_OPTS \
  ${EVAL_SECOND:+--second-options $EVAL_SECOND} \
  2>&1 | tee "$WD/eval.log" | tail -20

python - "$WD" "$SYNTH" <<'PYEOF'
import re, sys
txt = open(f"{sys.argv[1]}/eval.log").read()
# both summary formats: "AP@[.5:.95] all 500 = X" (eval/coco_eval.py
# summarize) and the pycocotools-style "AP ... IoU=0.50:0.95 ... = X"
m = (re.search(r"AP@\[\.5:\.95\][^=]*=\s*([-0-9.]+)", txt)
     or re.search(r"AP.*IoU=0\.50:0\.95.*?=\s*([-0-9.]+)", txt))
assert m, "no AP line in eval output"
ap = float(m.group(1))
print(f"VisDrone e2e AP@[.5:.95] = {ap}")
if sys.argv[2] == "1":
    print("synthetic dry-run complete (smoke AP is high-variance; "
          "not a quality signal)")
else:
    print("north star (BASELINE.md): reference parity +-0.3 "
          "(UFPMP-Det paper: ~36.6 on VisDrone-val)")
PYEOF
echo "VISDRONE E2E COMPLETE"
