#!/bin/bash
# Sustained training at the SHIPPED batch size (VERDICT round-2 item 7):
# face bs=15, 256^2, precision=high, 500 steps on the bundled clips,
# with history + eval tooling. Proves HBM stability (donate path) and
# that the steady step time matches the bench number at scale.
set -e
cd /root/repo
DATA=/root/reference/demo/face_examples
python -m wacv23_tsnet_tpu.cli.train_face \
  --label-path $DATA/labels --image-path $DATA/images \
  --num-videos 2 --batch-size 15 --precision high \
  --final-step 500 --save-pred-every 250 --print-freq 50 \
  --num-workers 6 --random-seed 1234 \
  --root-dir runs/sustained_bs15
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/sustained_bs15/snapshots \
  --out-dir artifacts/round3/sustained_bs15_eval
echo "=== sustained bs15 done ==="
