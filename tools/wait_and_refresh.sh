#!/bin/bash
# Poll until the TPU tunnel is up, then run the full evidence refresh
# (tools/refresh_tpu_results.sh). Usage:
#   nohup tools/wait_and_refresh.sh > /tmp/tpu_wait.log 2>&1 &
# Bounded: 60 probes x ~9 min ~= 9 h, then gives up loudly.
cd "$(dirname "$0")/.."
for i in $(seq 1 60); do
  echo "=== probe $i $(date -u)"
  p=$(timeout 120 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null)
  if [ "$p" = "axon" ] || [ "$p" = "tpu" ]; then
    echo "TPU_UP ($p) — running refresh"
    if bash tools/refresh_tpu_results.sh; then
      echo "REFRESH_DONE"
      exit 0
    fi
    echo "REFRESH_FAILED"
    exit 1
  fi
  sleep 420
done
echo "TPU_NEVER_CAME_UP"
exit 1
