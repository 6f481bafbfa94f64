#!/usr/bin/env python3
"""One more jax.profiler attempt through the axon relay (VERDICT r4 #8).

Rounds 3-4 could not capture a trace (the relay's profiler RPC never
materialized a trace directory).  This probe is deliberately tiny and
self-diagnosing: trace ONE warm 2048^2 matmul, then report exactly what
the trace directory contains (or the exception), so the artifact either
IS a trace or documents the failure mode precisely.

Usage: python scripts/probe_profiler.py [--out /tmp/mpx_trace]
"""
import argparse
import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mpx_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((2048, 2048), jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a).sum())
    float(np.asarray(f(x)))  # warm
    os.makedirs(args.out, exist_ok=True)
    try:
        t0 = time.time()
        with jax.profiler.trace(args.out):
            float(np.asarray(f(x)))
        print(f"trace context exited ok in {time.time() - t0:.1f}s",
              flush=True)
    except Exception:
        print("TRACE FAILED:", flush=True)
        traceback.print_exc()
        return 1
    files = sorted(glob.glob(os.path.join(args.out, "**", "*"),
                             recursive=True))
    total = sum(os.path.getsize(p) for p in files if os.path.isfile(p))
    print(f"trace dir: {len(files)} entries, {total} bytes", flush=True)
    for p in files[:20]:
        print(" ", p, os.path.getsize(p) if os.path.isfile(p) else "<dir>")
    return 0 if total > 0 else 2


if __name__ == "__main__":
    sys.exit(main())
