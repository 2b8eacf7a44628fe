#!/bin/bash
# Sequential chip work queue (single TPU): decoder sub-stage profile,
# then the VGG-ablation runs (VERDICT round-2 item 3), then the
# sustained shipped-batch run (item 7). Each step logs under
# artifacts/round3/logs/.
set -e
cd /root/repo
mkdir -p artifacts/round3/logs

echo "=== [1/3] decoder sub-stage profile ===" | tee artifacts/round3/logs/queue.log
timeout 900 python artifacts/round3/prof_decoder.py \
  2>&1 | grep -v WARNING | tee artifacts/round3/logs/prof_decoder.log

echo "=== [2/3] vgg ablation ===" | tee -a artifacts/round3/logs/queue.log
bash artifacts/round3/run_vgg_ablation.sh \
  2>&1 | tail -40 > artifacts/round3/logs/vgg_ablation.log

echo "=== [3/3] sustained bs15 ===" | tee -a artifacts/round3/logs/queue.log
bash artifacts/round3/run_sustained_bs15.sh \
  2>&1 | tail -40 > artifacts/round3/logs/sustained_bs15.log

echo "=== queue done ===" | tee -a artifacts/round3/logs/queue.log
