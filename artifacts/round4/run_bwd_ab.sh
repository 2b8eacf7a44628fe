#!/bin/bash
# Convergence A/B for the dual-precision backward (ops/dpconv.py):
# two identical 500-step face runs on the bundled clips, same seed and
# data order, differing ONLY in --bwd-precision (None vs "default", i.e.
# 3-pass vs 1-pass backward convs). Compares history.csv loss
# trajectories; healthy = same GAN dynamics, no divergence, comparable
# warp/FML/VGG losses at the matched steps. This is the evidence that
# lets bench.py call precision=high + bwd_precision=default "the
# sustained-run tier".
set -e
cd /root/repo
DATA=/root/reference/demo/face_examples
for tier in base fast; do
  EXTRA=""
  if [ "$tier" = "fast" ]; then EXTRA="--bwd-precision default"; fi
  python -m wacv23_tsnet_tpu.cli.train_face \
    --label-path $DATA/labels --image-path $DATA/images \
    --num-videos 2 --batch-size 15 --precision high $EXTRA \
    --final-step 500 --save-pred-every 500 --print-freq 50 \
    --num-workers 6 --random-seed 1234 \
    --root-dir runs/bwd_ab_$tier
done
python artifacts/round4/summarize_bwd_ab.py
echo "=== bwd A/B done ==="
