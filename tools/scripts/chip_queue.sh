#!/bin/bash
# Serial chip-work queue, run once by chip_watch.sh when the TPU tunnel
# answers.  Order: cheapest/highest-leverage first; each step re-checks
# /tmp/stop_queue so the queue can be halted (e.g. ahead of a driver
# bench run — two clients on the one chip would contend).
#
# Round-2 second-half additions: the remaining model-family convergence
# tracks (pv_rcnn_plusplus exercises the VectorPool aggregation path,
# pointrcnn_iou the PointRCNN+IoU-label head, voxel_rcnn_car the plain
# VoxelRCNN head without KL), plus the PartA2_free rerun.
set -x
cd /root/repo

guard() { [ -f /tmp/stop_queue ] && exit 0 || true; }

# 1. Prime the on-chip compile cache for the driver's round-end bench
guard
timeout 2400 python bench.py > /tmp/bench_chipwarm.log 2>&1

# 1b. Op-level traces for the two perf targets (gates kernel work)
guard
timeout 1800 python tools/profile_model.py train \
    configs/kitti_models/GLENet_VR.yaml > /tmp/prof_vr_train.log 2>&1
guard
timeout 1800 python tools/profile_model.py predict \
    configs/kitti_models/PartA2.yaml 40000 > /tmp/prof_pa2_predict.log 2>&1

# 2. PV-RCNN++ (VectorPool path, Waymo grid) — never run on chip
guard
timeout 10800 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/pv_rcnn_plusplus.yaml > /tmp/conv_pvpp.log 2>&1

# 3. PointRCNN-IoU (KITTI)
guard
timeout 7200 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/pointrcnn_iou.yaml > /tmp/conv_prcnn_iou.log 2>&1

# 4. Voxel R-CNN (Car) — plain head, flagship topology without KL
guard
timeout 7200 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/voxel_rcnn_car.yaml > /tmp/conv_vrcnn_car.log 2>&1

# 5. CaDDN (camera-only path, synthetic pinhole scenes)
guard
timeout 10800 python tools/convergence_caddn.py 700 1e-3 > /tmp/conv_caddn.log 2>&1

# 6. PartA2_free at 1500 steps, 16k eval voxel budget
guard
timeout 10800 python tools/convergence_ap.py 1500 1.5e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 > /tmp/conv_pa2free2.log 2>&1

echo QUEUE_DONE
