#!/bin/bash
# Round-5 convergence queue: sequential chip runs with per-run timeouts,
# a silent-stall watchdog (kill + one retry if the log stops moving for
# STALL_S), and a hard wall deadline after which no new run starts.
# Logs land in results/r5/ (in-repo — round-4 lesson: /tmp evidence dies
# with the sandbox).  Usage: run_queue_r5.sh <deadline_epoch_s>
set -u
cd /root/repo
DEADLINE=${1:?deadline epoch seconds}
STALL_S=1200
OUT=results/r5
mkdir -p "$OUT"

run_one() {
  local name=$1 tmo=$2; shift 2
  local log="$OUT/$name.log"
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== $name SKIPPED (past deadline) $(date)" >> "$OUT/queue.log"
    return
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt start $(date)" >> "$OUT/queue.log"
    timeout "$tmo" "$@" >> "$log" 2>&1 &
    local pid=$!
    # stall watchdog: kill if the log stops growing for STALL_S
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "=== $name STALLED (log idle ${age}s) — kill $(date)" \
          >> "$OUT/queue.log"
        kill "$pid" 2>/dev/null
        sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ "$(date +%s)" -ge $((DEADLINE + 600)) ]; then
        echo "=== $name OVER HARD DEADLINE — kill $(date)" >> "$OUT/queue.log"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return
      fi
    done
    wait "$pid"; local rc=$?
    echo "=== $name attempt $attempt rc=$rc $(date)" >> "$OUT/queue.log"
    [ "$rc" -eq 0 ] && return
    [ "$(date +%s)" -ge "$DEADLINE" ] && return
  done
}

run_one pa2free_1500 4500 \
  python -u tools/convergence_ap.py 1500 1e-3 \
  configs/kitti_models/PartA2_free.yaml 16000
run_one waymo_s_fbn 5400 \
  python -u tools/convergence_waymo.py 700 1e-3 \
  configs/waymo_models/GLENet_S.yaml 150
run_one s_holdout24 3000 \
  python -u tools/convergence_ap.py 700 1e-3 \
  configs/kitti_models/GLENet_S.yaml 40000 24
echo "=== queue done $(date)" >> "$OUT/queue.log"
