#!/bin/bash
# Convergence A/B for the fast-tail training tier: two identical
# 500-step face runs on the bundled clips, same seed and data order,
# differing ONLY in --fast-tail (decoder + FuseNet bf16/default-MXU vs
# f32/high). Both runs use the already-adopted dual-precision backward
# (--bwd-precision default). Healthy = same GAN dynamics, no divergence,
# comparable warp/FML/VGG losses at matched steps.
set -e
cd /root/repo
DATA=/root/reference/demo/face_examples
for tier in base fast; do
  EXTRA=""
  if [ "$tier" = "fast" ]; then EXTRA="--fast-tail"; fi
  python -m wacv23_tsnet_tpu.cli.train_face \
    --label-path $DATA/labels --image-path $DATA/images \
    --num-videos 2 --batch-size 15 --precision high \
    --bwd-precision default $EXTRA \
    --final-step 500 --save-pred-every 500 --print-freq 50 \
    --num-workers 6 --random-seed 1234 \
    --root-dir runs/ft_ab_$tier
done
python artifacts/round4/summarize_ft_ab.py
echo "=== fast-tail A/B done ==="
