"""Quick TPU tunnel health check with hard timeouts.

The axon tunnel can wedge (a stalled server-side compile holds the
grant — see the verify skill's "tunnel wedge hazard"); a wedged tunnel
makes even `jax.devices()` hang, so this probe runs the check in a
subprocess it can SIGKILL.

Usage: python tools/tpu_health.py [--timeout 90]
Exit codes: 0 healthy, 2 wedged/timeout, 3 backend error.
"""
from __future__ import annotations

import argparse
import subprocess
import sys

_PROBE = """
import jax, jax.numpy as jnp
d = jax.devices()
v = float(jnp.sum(jnp.ones((128, 128))))
print(f"HEALTHY platform={d[0].platform} devices={len(d)} sum={v}")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=90)
    args = ap.parse_args()
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c", _PROBE],
            capture_output=True,
            text=True,
            timeout=args.timeout,
        )
    except subprocess.TimeoutExpired:
        print(
            f"WEDGED: no response within {args.timeout}s — the tunnel is "
            "likely held by a stalled server-side compile; killing local "
            "processes will not free it"
        )
        return 2
    out = (r.stdout + r.stderr).strip().splitlines()
    for line in out:
        if line.startswith("HEALTHY"):
            print(line)
            return 0
    tail = "\n".join(out[-4:])
    print(f"BACKEND ERROR (rc={r.returncode}):\n{tail}")
    return 3


if __name__ == "__main__":
    sys.exit(main())
