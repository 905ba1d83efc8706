#!/bin/bash
# Serial chip-work queue: convergence reruns after the asymmetric-car
# harness fix (front-face density + rear cabin roof -> heading direction
# is geometrically learnable; validates the dir-classifier path instead of
# per-scene memorization).
set -x
cd /root/repo
timeout 3600 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/GLENet_S.yaml > /tmp/conv_s3.log 2>&1
timeout 7200 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/GLENet_S.yaml > /tmp/conv_gsw2.log 2>&1
timeout 14400 python tools/convergence_ap.py 2000 1e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 > /tmp/conv_pa2free2.log 2>&1
echo QUEUE_DONE
