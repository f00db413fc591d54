#!/bin/bash
# Detached TPU-recovery watcher: probe until the axon tunnel answers, then
# run the round-3 measurement campaign. Log: /tmp/r3_watch.log.
set -u
cd /root/repo
for i in $(seq 1 300); do
  if timeout 120 python -c "import jax; d = jax.devices(); print(d); assert d[0].platform == 'tpu', d" >/tmp/tpu_probe.out 2>&1; then
    echo "[watch] TPU UP (probe $i, $(date)): $(cat /tmp/tpu_probe.out)"
    bash /root/repo/tools/r3_campaign.sh
    exit 0
  fi
  echo "[watch] probe $i down ($(date))"
  sleep 90
done
echo "[watch] gave up $(date)"
