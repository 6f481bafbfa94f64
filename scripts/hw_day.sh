#!/bin/bash
# Hardware-measurement day: run every pending TPU measurement in
# sequence, each bounded and logged, continuing past failures.
#
#   bash scripts/hw_day.sh            # outputs under /tmp/hwday/
#
# Stages:
#   0. device probe (init + tiny matmul)
#   1. showcase bench (python bench.py -> showcase.json)
#   2. suite refresh (scripts/refresh_suite.py -> BENCH_SUITE.json + table)
#   3. pan bench (scripts/pan_bench.py 20 16 -> pan_bench.json)
#   4. small-fused breakdown (scripts/probe_small_fused.py -> italian.txt)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hwday
mkdir -p "$OUT"
log() { echo "[hw_day $(date +%H:%M:%S)] $*"; }

log "stage 0: device probe"
timeout 600 python - <<'EOF' 2>&1 | tee "$OUT/probe.txt"
import time; t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices(), f"init {time.time()-t0:.1f}s")
t1 = time.time()
y = float(np.asarray(jnp.dot(jnp.ones((512, 512)), jnp.ones((512, 512))).sum()))
# tolerance, not equality: the relay's matmul may round slightly
# (observed 134217730.0 for the exact 2**27)
ok = abs(y - 512.0 ** 3) <= 1e-4 * 512.0 ** 3
print("matmul:", y, f"{time.time()-t1:.1f}s", "PROBE_OK" if ok else "PROBE_BAD")
EOF
if ! grep -q "PROBE_OK" "$OUT/probe.txt"; then
    log "device probe FAILED - aborting (relay still down?)"
    exit 1
fi

log "stage 1: showcase bench"
timeout 1800 python bench.py 2> "$OUT/showcase.err" | tee "$OUT/showcase.json"

log "stage 2: suite refresh"
timeout 5400 python scripts/refresh_suite.py 2> "$OUT/suite.err" \
    | tee "$OUT/suite_table.md"
python scripts/sync_docs.py

log "stage 3: pan bench"
timeout 3600 python scripts/pan_bench.py 20 16 2> "$OUT/pan.err" \
    | tee "$OUT/pan_bench.json"

log "stage 4: small-fused breakdown"
timeout 1200 python scripts/probe_small_fused.py 3 2> "$OUT/italian.err" \
    | tee "$OUT/italian.txt"

log "done - outputs in $OUT"
