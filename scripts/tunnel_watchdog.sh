#!/bin/bash
# Probe the TPU tunnel every 150s; when it answers, run the on-chip
# validation suite then the bench, leaving logs in /tmp/tpu_watchdog/.
# Single-flight: exits after one successful validate+bench cycle.
set -u
OUT=/tmp/tpu_watchdog
mkdir -p "$OUT"
cd /root/repo
for i in $(seq 1 200); do
  # assert the platform: jax.devices() can fall back to CPU (plugin list
  # 'axon,cpu'), which must NOT count as tunnel-up
  timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform == 'tpu', d; print('TPU OK:', d)" \
    > "$OUT/probe.log" 2>&1
  if grep -q "TPU OK" "$OUT/probe.log"; then
    echo "$(date -u +%FT%TZ) tunnel up on probe $i" >> "$OUT/status.log"
    timeout 2400 python scripts/validate_tpu.py > "$OUT/validate.log" 2>&1
    echo "validate rc=$?" >> "$OUT/status.log"
    timeout 1750 python bench.py > "$OUT/bench.log" 2>&1
    echo "bench rc=$?" >> "$OUT/status.log"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) probe $i: down" >> "$OUT/status.log"
  sleep 60
done
echo "gave up after 200 probes" >> "$OUT/status.log"
exit 1
