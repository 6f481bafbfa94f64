#!/bin/bash
# Round-5 finishing-burst: the pending hardware measurements in
# priority order, sized for the relay's observed 10-15 min UP windows.
# Every stage re-probes the relay first (a dying relay must not wedge a
# stage for its full timeout), persists its rows via refresh_suite's
# per-row writer, and drops a done-marker on success so re-invocations
# resume at the first incomplete stage (relay windows are shorter than
# the full queue).
#
#   bash scripts/hw_day_r5.sh          # logs under /tmp/hwr5/
#
# Pending queue (ROADMAP round-5 notes):
#   1. cheap small rows     -> attach dispatch_bound/latency_floor_ms
#   2. mstamp + batch       -> netsort + geometry, work_factor fields
#   3. profiler attempt     -> VERDICT r4 #8 (trace or failure mode)
#   4. ring f64 + f32       -> device-side pass-B thresholds (d512752)
#   5. topk-f64-1M          -> wide-K2 pass-C escalation vs the 832s wall
#   6. bench.py             -> showcase >= 2.0x confirmation artifact
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hwr5
mkdir -p "$OUT"
log() { echo "[hw_r5 $(date +%H:%M:%S)] $*"; }

probe() {
    timeout 90 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
y = float(np.asarray(jnp.dot(jnp.ones((512, 512)), jnp.ones((512, 512))).sum()))
assert abs(y - 512.0 ** 3) <= 1e-4 * 512.0 ** 3
EOF
}

stage() {  # stage <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    if [ -e "$OUT/done.$name" ]; then
        log "stage $name: already done - skipping"
        return 0
    fi
    if ! probe; then
        log "stage $name: relay DOWN at probe - skipping"
        return 1
    fi
    log "stage $name: start (timeout ${to}s)"
    timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
    local rc=$?
    log "stage $name: rc=$rc"
    [ $rc -eq 0 ] && touch "$OUT/done.$name"
    return $rc
}

stage small 600 python scripts/refresh_suite.py \
    --only vanilla-f32-8192 --only real-sudden-cardiac-death \
    --only real-italian-power-f64 --only tiled-f32-131072
stage mstamp-batch 700 python scripts/refresh_suite.py \
    --only mstamp-f32-d4-131072 --only batch-f32-256x8192
stage profiler 300 python scripts/probe_profiler.py
stage rings 1200 python scripts/refresh_suite.py \
    --only ring-f64-1048576 --only ring-f32-1048576
stage topk 1500 python scripts/refresh_suite.py \
    --only topk-f64-1048576-k4
stage showcase 900 python bench.py
log "burst pass done; artifacts in $OUT + BENCH_SUITE.json"
ls "$OUT"/done.* 2>/dev/null | wc -l
