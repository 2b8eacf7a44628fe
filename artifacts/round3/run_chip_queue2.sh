#!/bin/bash
# Chip queue 2: verify the new decoder fast path on chip, profile it,
# re-bench, then redo the crashed runs (ablation run B + sustained bs15)
# with the space-to-batch workaround in place.
set -e
cd /root/repo
mkdir -p artifacts/round3/logs
Q=artifacts/round3/logs

step() { echo "=== $1 ==="; }

step "decoder parity on chip"
timeout 900 python artifacts/round3/check_decoder_chip.py \
  2>&1 | grep -v WARNING | tee $Q/check_decoder.log

step "resblock probe"
timeout 900 python artifacts/round3/probe_resblock.py \
  2>&1 | grep -v WARNING | tee $Q/probe_resblock.log

step "inference stage profile"
timeout 900 python -m wacv23_tsnet_tpu.cli.profile_stages \
  2>&1 | grep -v WARNING | tee $Q/profile_stages.log

step "decoder sub-stages"
timeout 900 python artifacts/round3/prof_decoder.py \
  2>&1 | grep -v WARNING | tee $Q/prof_decoder2.log

step "bench"
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tee $Q/bench.log

step "vgg ablation run B (lambda_vgg=0)"
DATA=/root/reference/demo/face_examples
python -m wacv23_tsnet_tpu.cli.train_face \
  --label-path $DATA/labels --image-path $DATA/images \
  --num-videos 2 --batch-size 4 --precision high \
  --final-step 800 --save-pred-every 200 --print-freq 100 \
  --num-workers 4 --random-seed 1234 --lambda-vgg 0 \
  --root-dir runs/ablation_vgg0 2>&1 | tail -20 > $Q/ablation_vgg0.log

step "eval ablation A"
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/ablation_vgg10/snapshots \
  --out-dir artifacts/round3/vgg_ablation/eval_vgg10 \
  2>&1 | tail -10 > $Q/eval_vgg10.log
step "eval ablation B"
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/ablation_vgg0/snapshots \
  --out-dir artifacts/round3/vgg_ablation/eval_vgg0 \
  2>&1 | tail -10 > $Q/eval_vgg0.log

step "sustained bs15"
python -m wacv23_tsnet_tpu.cli.train_face \
  --label-path $DATA/labels --image-path $DATA/images \
  --num-videos 2 --batch-size 15 --precision high \
  --final-step 500 --save-pred-every 250 --print-freq 50 \
  --num-workers 6 --random-seed 1234 \
  --root-dir runs/sustained_bs15 2>&1 | tail -20 > $Q/sustained_bs15.log
python -m wacv23_tsnet_tpu.cli.eval_snapshots \
  --snapshot-dir runs/sustained_bs15/snapshots \
  --out-dir artifacts/round3/sustained_bs15_eval \
  2>&1 | tail -10 > $Q/sustained_eval.log

echo "=== queue2 done ==="
