"""Compile-probe the opt-in fused conv-module Pallas kernel on the REAL
chip (VERDICT r4 #7): journal first, compile in a killable subprocess
with a hard timeout (a Mosaic remote compile that never terminates is
the round-2 wedge hazard — killing the local process does NOT free the
server-side grant, so this probe is run LAST in the round's TPU queue).

Escalates small → encoder scale; at each shape reports fused vs unfused
(XLA) wall time with honest readback.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fused_convmodule.py
       [--timeout 600] [--shapes small,encoder]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from espnet_tpu.ops.fused_convmodule import fused_conv_module, reference_conv_module
from espnet_tpu.utils.timing import force

b, t, d, k = map(int, sys.argv[1:5])
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
mask = jnp.asarray(np.ones((b, t), np.float32))
args = (
    x, mask,
    jnp.asarray(rng.randn(d, 2 * d).astype(np.float32) * 0.05),  # w1
    jnp.zeros((2 * d,)),                                          # b1
    jnp.asarray(rng.randn(k, d).astype(np.float32) * 0.1),       # dw
    jnp.zeros((d,)),                                              # bdw
    jnp.ones((d,)), jnp.zeros((d,)),                              # gscale/gbias
    jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05),      # w2
    jnp.zeros((d,)),                                              # b2
)

def timeit(fn, n=20):
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    force(out)
    return compile_s, (time.perf_counter() - t0) / n * 1e3

c_f, fused_ms = timeit(jax.jit(lambda *a: fused_conv_module(*a)))
c_r, ref_ms = timeit(jax.jit(lambda *a: reference_conv_module(*a)))
print(json.dumps({"shape": [b, t, d, k], "compile_s": round(c_f, 1),
                  "fused_ms": round(fused_ms, 3),
                  "unfused_xla_ms": round(ref_ms, 3),
                  "speedup": round(ref_ms / fused_ms, 2)}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--shapes", default="small,encoder")
    args = ap.parse_args()

    from espnet_tpu.utils.device_journal import journal_device_use, journal_probe

    journal_device_use("probe_fused_convmodule")
    shapes = {
        "small": (8, 128, 256, 31),
        "encoder": (128, 128, 256, 31),
    }
    for name in args.shapes.split(","):
        b, t, d, k = shapes[name]
        print(f"probing fused conv-module at {name} {b}x{t}x{d} k{k} "
              f"(timeout {args.timeout}s)...", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-u", "-c", _CHILD,
                 str(b), str(t), str(d), str(k)],
                capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            journal_probe(
                "FUSED_CONVMODULE_COMPILE_TIMEOUT",
                f"{name} {b}x{t}x{d} after {args.timeout}s — chip may be "
                "wedged server-side; run tools/tpu_health.py",
            )
            print(f"TIMEOUT at {name}: Mosaic compile did not return in "
                  f"{args.timeout}s. The server-side compile may still "
                  "hold the grant — check tpu_health before further TPU use.")
            return 2
        out = (r.stdout + r.stderr).strip()
        if r.returncode != 0:
            journal_probe("FUSED_CONVMODULE_ERROR", out[-200:])
            print(f"FAILED at {name} (rc={r.returncode}):\n{out[-2000:]}")
            return 3
        json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        result = json_lines[-1] if json_lines else out.splitlines()[-1]
        print(result)
        journal_probe("FUSED_CONVMODULE_OK", result[:200])
    return 0


if __name__ == "__main__":
    sys.exit(main())
