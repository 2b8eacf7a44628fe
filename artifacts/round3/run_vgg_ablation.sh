#!/bin/bash
# VGG-ablation runs (VERDICT round-2 item 3): same seed/data/steps,
# lambda_vgg=10 (random-VGG fallback) vs lambda_vgg=0. Sequential on the
# single chip; ~0.3 s/step at bs=4 -> ~2x5 min + evals.
set -e
cd /root/repo
DATA=/root/reference/demo/face_examples
COMMON="--label-path $DATA/labels --image-path $DATA/images \
  --num-videos 2 --batch-size 4 --precision high \
  --final-step 800 --save-pred-every 200 --print-freq 100 \
  --num-workers 4 --random-seed 1234"

echo "=== run A: lambda_vgg=10 (random-VGG) ==="
python -m wacv23_tsnet_tpu.cli.train_face $COMMON \
  --root-dir runs/ablation_vgg10
echo "=== run B: lambda_vgg=0 ==="
python -m wacv23_tsnet_tpu.cli.train_face $COMMON \
  --lambda-vgg 0 --root-dir runs/ablation_vgg0

echo "=== eval A ==="
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/ablation_vgg10/snapshots \
  --out-dir artifacts/round3/vgg_ablation/eval_vgg10
echo "=== eval B ==="
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/ablation_vgg0/snapshots \
  --out-dir artifacts/round3/vgg_ablation/eval_vgg0
echo "=== done ==="
