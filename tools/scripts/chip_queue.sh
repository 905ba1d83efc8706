#!/bin/bash
# Serial chip-work queue, run once by chip_watch.sh when the TPU tunnel
# answers.  Order: cheapest/highest-leverage first; each step re-checks
# /tmp/stop_queue so the queue can be halted (e.g. ahead of a driver
# bench run — two clients on the one chip would contend).
#
# Convergence reruns validate the asymmetric-car + camera-FOV harness
# fixes (front-face density + rear cabin roof make heading direction
# geometrically learnable; FOV placement makes bbox/aos AP meaningful).
set -x
cd /root/repo

guard() { [ -f /tmp/stop_queue ] && exit 0 || true; }

# 1. Prime the on-chip compile cache for the driver's round-end bench
guard
timeout 2400 python bench.py > /tmp/bench_chipwarm.log 2>&1

# 2. KITTI GLENet-S rerun on the fixed harness (~40-80 min)
guard
timeout 5400 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/GLENet_S.yaml > /tmp/conv_s3.log 2>&1

# 3. PartA2_free at 1500 steps, 16k eval voxel budget
guard
timeout 9000 python tools/convergence_ap.py 1500 1e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 > /tmp/conv_pa2free2.log 2>&1

# 4. Waymo-scale GLENet-S (150 m grid)
guard
timeout 7200 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/GLENet_S.yaml > /tmp/conv_gsw2.log 2>&1

echo QUEUE_DONE
