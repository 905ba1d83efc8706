#!/bin/bash
# Follow-up chip queue (round 4): re-runs of the two items that crashed
# in the first pass (Waymo GLENet-S hit a transient worker-side compile
# SIGKILL during concurrent compiles; PartA2_free hit the gather_gemm_b
# inverse-shape bug, fixed in 773aa4b).
set -x
cd /root/repo

guard() { [ -f /tmp/stop_queue ] && exit 0 || true; }

# 1. PartA2_free, 1500 steps, 16k eval budget (VERDICT #4)
guard
timeout 10800 python tools/convergence_ap.py 1500 1.5e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 > /tmp/conv_pa2free2.log 2>&1

# 2. Waymo GLENet-S with the frozen-BN fine-tune tail (VERDICT #6)
guard
timeout 7200 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/GLENet_S.yaml 150 > /tmp/conv_glenet_s_waymo2.log 2>&1

# 3. Prime the bench compile cache for the driver's round-end run
guard
timeout 2400 python bench.py > /tmp/bench_chipwarm2.log 2>&1

echo QUEUE2_DONE
