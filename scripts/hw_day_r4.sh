#!/bin/bash
# Round-4 hardware-measurement battery, ordered by evidence value so a
# relay window of any length captures the most important numbers first.
#
#   bash scripts/hw_day_r4.sh          # outputs under /tmp/hwday4/
#
# Stages (each bounded, continues past failures):
#   0. device probe
#   1. showcase double x2 (the >=2.0x target, post precompute-fix)
#   2. stats-staging probe (device-stats crossover data)
#   3. suite refresh — every non-huge row incl. the 10 pending round-3
#      tiers (ring f32/f64, topk, contrast, damp, thresh, mstamp,
#      batch, matrix, merlin)
#   4. pod-16M diagnosis probe (HIGHEST vs HIGH rate, ~5 min)
#   5. pan bench + small-fused breakdown
#   6. (explicit, long) full pod-16M row re-run — only with RUN_POD=1
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hwday4
mkdir -p "$OUT"
log() { echo "[hw_day_r4 $(date +%H:%M:%S)] $*"; }

log "stage 0: device probe"
timeout 600 python - <<'EOF' 2>&1 | tee "$OUT/probe.txt"
import time; t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), f"init {time.time()-t0:.1f}s")
t1 = time.time()
y = float(np.asarray(jnp.dot(jnp.ones((512, 512)), jnp.ones((512, 512))).sum()))
ok = abs(y - 512.0 ** 3) <= 1e-4 * 512.0 ** 3
print("matmul:", y, f"{time.time()-t1:.1f}s", "PROBE_OK" if ok else "PROBE_BAD")
EOF
if ! grep -q "PROBE_OK" "$OUT/probe.txt"; then
    log "device probe FAILED - aborting (relay still down?)"
    exit 1
fi

log "stage 1: showcase double x2"
timeout 1500 python bench.py -n 1048576 -m 256 --dtype double \
    --band 4096 --chunk 32768 --verbose \
    > "$OUT/showcase1.json" 2> "$OUT/showcase1.err"
tail -1 "$OUT/showcase1.json"
timeout 900 python bench.py -n 1048576 -m 256 --dtype double \
    --band 4096 --chunk 32768 \
    > "$OUT/showcase2.json" 2> "$OUT/showcase2.err"
tail -1 "$OUT/showcase2.json"

log "stage 2: stats staging probe"
timeout 900 python scripts/probe_stats_staging.py \
    > "$OUT/staging.txt" 2>&1 || log "staging probe failed"

log "stage 3: suite refresh (non-huge rows)"
timeout 7200 python scripts/refresh_suite.py --verbose \
    > "$OUT/suite_table.md" 2> "$OUT/suite.err"
python scripts/sync_docs.py

log "stage 4: pod-16M diagnosis probe"
timeout 1500 python scripts/probe_pod16m.py \
    > "$OUT/pod16m.txt" 2>&1 || log "pod16m probe failed"
cat "$OUT/pod16m.txt" | tail -4

log "stage 5: pan bench + small-fused breakdown"
timeout 3600 python scripts/pan_bench.py 20 16 2> "$OUT/pan.err" \
    | tee "$OUT/pan_bench.json"
timeout 1200 python scripts/probe_small_fused.py 3 2> "$OUT/italian.err" \
    | tee "$OUT/italian.txt"

if [ "${RUN_POD:-0}" = "1" ]; then
    log "stage 6: full pod-16M row (explicit, ~1 h)"
    timeout 5400 python scripts/refresh_suite.py --only pod-f32-16777216 \
        --verbose > "$OUT/pod_row.md" 2> "$OUT/pod.err"
    python scripts/sync_docs.py
fi

log "done - outputs in $OUT"
