#!/bin/sh
# Controlled data-echoing ablation (VERDICT r4 #5): identical occlusion
# task/seed/schedule at pinned echo factors 64, 1, 8; merged into
# CONVERGENCE_r05.json by tools/merge_echo_ablation.py.
set -x
cd /root/repo
for E in 64 1 8; do
  python tools/convergence.py --task occlusion --q 0.4 --steps 8000 \
    --echo "$E" --out "/tmp/CONV_echo${E}.json" \
    > "/tmp/conv_echo${E}.log" 2>&1 || echo "echo=$E FAILED" >> /tmp/echo_abl_status
  echo "echo=$E done $(date +%H:%M:%S)" >> /tmp/echo_abl_status
done
echo ALL_DONE >> /tmp/echo_abl_status
