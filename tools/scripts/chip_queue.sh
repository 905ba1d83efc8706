#!/bin/bash
# Serial chip-work queue (round 4): accuracy-evidence runs addressing
# VERDICT r3 items, ordered by leverage.  Each step re-checks
# /tmp/stop_queue so the queue can be halted (e.g. ahead of a driver
# bench run — two clients on the one chip would contend).
set -x
cd /root/repo

guard() { [ -f /tmp/stop_queue ] && exit 0 || true; }

# 1. Waymo GLENet-S with the frozen-BN fine-tune tail (VERDICT #6: kill
#    the APH artifact, target APH within 2 of AP)
guard
timeout 7200 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/GLENet_S.yaml 150 > /tmp/conv_glenet_s_waymo.log 2>&1

# 3. Stage-2 recovery recipe measurement (VERDICT #8)
guard
timeout 3600 python tools/stage2_recovery.py 200 1e-3 \
    > /tmp/stage2_recovery.log 2>&1

# 4. PartA2_free at the 16k eval budget (VERDICT #4; rerun with any fix)
guard
timeout 10800 python tools/convergence_ap.py 1500 1.5e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 > /tmp/conv_pa2free.log 2>&1

# 5. CaDDN convergence evidence (VERDICT #5)
guard
timeout 7200 python tools/convergence_caddn.py 700 1e-3 \
    > /tmp/conv_caddn.log 2>&1

# 5. GLENet-S holdout (KITTI; second generalization track)
guard
timeout 5400 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/GLENet_S.yaml 40000 8 > /tmp/conv_s_holdout.log 2>&1

# 7. Prime the bench compile cache for the driver's round-end run
guard
timeout 2400 python bench.py > /tmp/bench_chipwarm.log 2>&1

echo QUEUE_DONE
