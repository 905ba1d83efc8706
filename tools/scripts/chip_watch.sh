#!/bin/bash
# Probe the TPU tunnel every 5 min; when it answers, run the queued chip
# work (tools/scripts/chip_queue.sh) once and exit.
cd /root/repo
while true; do
    timeout 180 python - <<'EOF' > /tmp/chip_probe.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
import jax.numpy as jnp
print(float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))
print('CHIP_UP', d)
EOF
    if grep -q CHIP_UP /tmp/chip_probe.log; then
        echo "chip up at $(date)" >> /tmp/chip_watch.log
        touch /tmp/chip_up
        bash tools/scripts/chip_queue.sh >> /tmp/chip_watch.log 2>&1
        exit 0
    fi
    echo "chip still down at $(date)" >> /tmp/chip_watch.log
    sleep 300
done
