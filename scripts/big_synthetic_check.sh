#!/bin/bash
# TPU-scale synthetic quality gate: the "big" twin of
# full_workflow_check.sh. Trains the real flagship configs (YOLOX-s
# coarse @640, MP-Det R50 @1024) for ~3k steps each on a 160-image
# synthetic small-object set and runs the two-stage eval; round-1
# reference result: e2e AP@[.5:.95] 0.701 / AP@.5 0.962 on one v5e
# chip (~30-40 min incl. compiles). Run whenever the serving/eval path
# changes to catch quality regressions the smoke-level check cannot
# (its 6-epoch nano models give high-variance AP 0.04-0.17).
#
# Usage: bash scripts/big_synthetic_check.sh [workdir]   (TPU)
set -e
cd "$(dirname "$0")/.."
WD=${1:-/tmp/glsdet_big}
rm -rf "$WD"; mkdir -p "$WD"

python - "$WD" <<'PYEOF'
import sys, os
import numpy as np, cv2

wd = sys.argv[1]
os.makedirs(f"{wd}/images", exist_ok=True)
os.makedirs(f"{wd}/annotations", exist_ok=True)
rs = np.random.RandomState(0)
# 6 visually distinct classes; boxes 12-42 px on VisDrone-sized frames
COLORS = [(220, 40, 40), (40, 220, 40), (40, 40, 220),
          (220, 220, 40), (220, 40, 220), (40, 220, 220)]
for i in range(160):
    img = rs.randint(20, 70, (765, 1360, 3)).astype(np.uint8)
    lines = []
    for _ in range(rs.randint(8, 20)):
        w, h = rs.randint(12, 42), rs.randint(12, 42)
        x, y = rs.randint(0, 1360 - w), rs.randint(0, 765 - h)
        c = rs.randint(0, 6)
        img[y:y+h, x:x+w] = COLORS[c]
        lines.append(f"{x},{y},{w},{h},1,{c+1},0,0")
    cv2.imwrite(f"{wd}/images/{i:04d}.jpg", img)
    open(f"{wd}/annotations/{i:04d}.txt", "w").write("\n".join(lines))
print(f"synthetic dataset at {wd}: 160 images")
PYEOF

python tools/convert_datasets.py visdrone "$WD" "$WD/train.json"

echo "=== stage 1: coarse YOLOX-s @640, ~3k steps ==="
python tools/train.py coarse_det \
  --ann "$WD/train.json" --img-root "$WD/images" \
  --work-dir "$WD/coarse" \
  --cfg-options data.batch_size=8 data.num_workers=2 data.max_gt=30 \
    data.mosaic=False data.mixup=False data.hsv=False \
    train.epochs=150 train.base_lr=0.004 train.warmup_epochs=5 \
    train.num_last_epochs=10 train.ckpt_interval=150 \
    train.log_interval=100 eval.coarse_score_thr=0.1

echo "=== stage 1b: coarse-only AP (informational) ==="
# stage-1 quality on its own: the square-IoU recipe converges
# localization only in the last-epochs L1 phase, so expect the
# high-AP@.5 / low-AP@.75 profile (r04 reference point on this set:
# 0.330 / 0.685 / 0.233 @ [.5:.95] / .5 / .75) — the e2e AP is carried
# by MP-Det; watch this number when touching the coarse recipe
python tools/test.py coarse_det --ckpt "$WD/coarse/epoch_150" \
  --ann "$WD/train.json" --img-root "$WD/images" \
  --cfg-options eval.score_thr=0.05 2>&1 | grep -E "AP@|AP small|AP medium"

echo "=== stage 2: UFP dataset build ==="
python tools/build_ufp_dataset.py coarse_det "$WD/coarse/epoch_150" \
  "$WD/train.json" "$WD/images" "$WD/ufp" \
  --cfg-options eval.coarse_score_thr=0.1

echo "=== stage 3: MP-Det R50 @1024, ~3k steps ==="
python tools/train.py mp_det_res50 \
  --ann "$WD/ufp/ufp_train.json" --img-root "$WD/ufp/images" \
  --work-dir "$WD/mpdet" \
  --cfg-options data.batch_size=8 data.num_workers=2 data.max_gt=60 \
    train.epochs=150 train.base_lr=0.004 train.ckpt_interval=150 \
    train.log_interval=100 train.ot_interval=500

echo "=== stage 4: two-stage eval (bf16) ==="
python tools/ufpmp_det_eval.py \
  coarse_det "$WD/coarse/epoch_150" mp_det_res50 "$WD/mpdet/epoch_150" \
  "$WD/train.json" "$WD/images" --out-json "$WD/two_stage_dets.json" \
  --first-options eval.coarse_score_thr=0.1 \
  2>&1 | tee "$WD/eval.log" | tail -20

echo "=== stage 5: two-stage eval (static int8) — accuracy gate for ==="
echo "=== the bench headline precision (bench.py GLSDET_INT8=static) ==="
python tools/ufpmp_det_eval.py \
  coarse_det "$WD/coarse/epoch_150" mp_det_res50 "$WD/mpdet/epoch_150" \
  "$WD/train.json" "$WD/images" --out-json "$WD/two_stage_dets_int8.json" \
  --int8-scales "$WD/int8_scales.json" \
  --first-options eval.coarse_score_thr=0.1 \
  2>&1 | tee "$WD/eval_int8.log" | tail -20

python - "$WD" <<'PYEOF'
import json, re, sys

def ap_of(path):
    txt = open(path).read()
    # both summary formats: eval/coco_eval.py summarize
    # ("AP@[.5:.95] all 500 = X") and pycocotools-style
    m = (re.search(r"AP@\[\.5:\.95\][^=]*=\s*([-0-9.]+)", txt)
         or re.search(r"AP.*IoU=0\.50:0\.95.*?=\s*([-0-9.]+)", txt))
    assert m, f"no AP line in {path}"
    return float(m.group(1))

wd = sys.argv[1]
ap = ap_of(f"{wd}/eval.log")
ap8 = ap_of(f"{wd}/eval_int8.log")
delta = ap - ap8
out = {"ap_bf16": ap, "ap_int8_static": ap8, "ap_delta": round(delta, 4)}
json.dump(out, open(f"{wd}/quality.json", "w"), indent=1)
print(f"e2e AP@[.5:.95] bf16={ap} int8-static={ap8} delta={delta:+.4f}")
assert ap >= 0.5, f"quality gate failed: AP {ap} < 0.5 (round-1: 0.701)"
# int8 may only cost up to 0.5 AP points vs bf16 (negative delta =
# int8 happened to score higher; that's fine)
assert delta < 0.005, \
    f"int8 accuracy gate failed: bf16-int8 AP delta {delta:.4f} >= 0.005"
print("BIG SYNTHETIC CHECK PASSED (incl. int8 accuracy gate)")
PYEOF
