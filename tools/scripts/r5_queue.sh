#!/bin/bash
# Round-5 convergence queue: sequential chip runs, per-run timeout
# (watchdog for TPU worker hangs), logs + results land IN-REPO
# (results/r5/*.log + CONVERGENCE_AP.json merged by each harness).
cd /root/repo || exit 1
mkdir -p results/r5

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u '+%F %H:%M:%S')" >> results/r5/queue.log
  timeout "$tmo" "$@" > "results/r5/$name.log" 2>&1
  echo "=== $name rc=$? $(date -u '+%F %H:%M:%S')" >> results/r5/queue.log
}

# 1. VR + 24-scene holdout: validates the tightened level caps AND the
#    holdout scale-up (VERDICT r4 item 5) in one run
run vr_holdout24 9000 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/GLENet_VR.yaml 16000 24
# 2. PartA2_free, 1500 steps (the run left pending at r4 close)
run pa2free_1500 14400 python tools/convergence_ap.py 1500 1e-3 \
    configs/kitti_models/PartA2_free.yaml 16000 0
# 3. Waymo GLENet-S with the frozen-BN tail (default 150)
run waymo_s_frozenbn 10800 python tools/convergence_waymo.py 700 1e-3 \
    configs/waymo_models/GLENet_S.yaml 150
# 4. GLENet-S + 24-scene holdout
run s_holdout24 9000 python tools/convergence_ap.py 700 1e-3 \
    configs/kitti_models/GLENet_S.yaml 16000 24
echo "QUEUE DONE $(date -u '+%F %H:%M:%S')" >> results/r5/queue.log
