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
    ap.add_argument(
        "--retries",
        type=int,
        default=1,
        help="extra attempts after a timeout: a COLD tunnel can take "
        ">90s to establish its first connection and then answer "
        "instantly, so a single timeout does not prove a wedge",
    )
    args = ap.parse_args()
    r = None
    for attempt in range(1 + args.retries):
        try:
            r = subprocess.run(
                [sys.executable, "-u", "-c", _PROBE],
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            break
        except subprocess.TimeoutExpired:
            if attempt < args.retries:
                print(f"attempt {attempt + 1}: timeout {args.timeout}s "
                      "(may be tunnel cold-start); retrying")
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from espnet_tpu.utils.device_journal import journal_probe

    if r is None:
        journal_probe(
            "WEDGED", f"{1 + args.retries} attempts of {args.timeout}s"
        )
        print(
            f"WEDGED: no response in {1 + args.retries} attempts of "
            f"{args.timeout}s — likely a stalled server-side compile "
            "holding the grant; killing local processes will not free it. "
            "Check .device_journal.jsonl for the last device-touching "
            "invocation."
        )
        return 2
    out = (r.stdout + r.stderr).strip().splitlines()
    for line in out:
        if line.startswith("HEALTHY"):
            journal_probe("HEALTHY", line)
            print(line)
            return 0
    tail = "\n".join(out[-4:])
    journal_probe("BACKEND_ERROR", tail)
    print(f"BACKEND ERROR (rc={r.returncode}):\n{tail}")
    return 3


if __name__ == "__main__":
    sys.exit(main())
