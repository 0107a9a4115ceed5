"""CLI: multi-process / multi-node launcher (reference:
espnet2/bin/launch.py — ssh heredoc :220, slurm srun :272).

Starts one process per host (or N local processes for testing), exporting
the env vars DistributedOption.resolve() consumes (MASTER_ADDR/PORT,
WORLD_SIZE, RANK), then execs the given training command.

Usage:
  python -m espnet_tpu.bin.launch --nproc 2 -- \
      python -m espnet_tpu.bin.asr_train --config ... --expdir ...
  python -m espnet_tpu.bin.launch --hosts host1,host2 --master_addr host1 -- \
      python -m espnet_tpu.bin.asr_train ...
  python -m espnet_tpu.bin.launch --slurm --nproc 4 -- python -m ... (emits srun)
"""
from __future__ import annotations

import argparse
import os
import shlex
import socket
import subprocess
import sys


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        argv, cmd = argv[:split], argv[split + 1 :]
    else:
        parser_err = "missing '-- <training command>'"
        raise SystemExit(parser_err)

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--nproc", type=int, default=None,
                        help="local worker count (testing mode)")
    parser.add_argument("--hosts", default=None,
                        help="comma-separated host list (ssh mode)")
    parser.add_argument("--slurm", action="store_true",
                        help="emit+exec an srun wrapper")
    parser.add_argument("--master_addr", default=None)
    parser.add_argument("--master_port", type=int, default=None)
    parser.add_argument("--env", action="append", default=[],
                        help="extra KEY=VALUE exported to every worker")
    args = parser.parse_args(argv)

    port = args.master_port or free_port()
    extra = dict(kv.split("=", 1) for kv in args.env)

    if args.slurm:
        # under slurm, srun sets SLURM_PROCID/SLURM_NTASKS per task;
        # DistributedOption.resolve() picks them up
        n = args.nproc or int(os.environ.get("SLURM_NTASKS", "1"))
        master = args.master_addr or os.environ.get("SLURMD_NODENAME", "127.0.0.1")
        srun = [
            "srun", f"--ntasks={n}", "--export=ALL,"
            + ",".join(
                [f"MASTER_ADDR={master}", f"MASTER_PORT={port}"]
                + [f"{k}={v}" for k, v in extra.items()]
            ),
        ] + cmd
        print("launch:", " ".join(shlex.quote(c) for c in srun), flush=True)
        raise SystemExit(subprocess.call(srun))

    if args.hosts:
        hosts = [h for h in args.hosts.split(",") if h]
        master = args.master_addr or hosts[0]
        procs = []
        for rank, host in enumerate(hosts):
            env_line = " ".join(
                [
                    f"MASTER_ADDR={master}",
                    f"MASTER_PORT={port}",
                    f"WORLD_SIZE={len(hosts)}",
                    f"RANK={rank}",
                ]
                + [f"{k}={v}" for k, v in extra.items()]
            )
            remote = f"cd {shlex.quote(os.getcwd())} && {env_line} " + " ".join(
                shlex.quote(c) for c in cmd
            )
            procs.append(subprocess.Popen(["ssh", host, remote]))
            print(f"launch: rank {rank} on {host}", flush=True)
        rc = max(p.wait() for p in procs)
        raise SystemExit(rc)

    # local multi-process (testing / single machine)
    n = args.nproc or 1
    procs = []
    for rank in range(n):
        env = {
            **os.environ,
            **extra,
            "MASTER_ADDR": args.master_addr or "127.0.0.1",
            "MASTER_PORT": str(port),
            "WORLD_SIZE": str(n),
            "RANK": str(rank),
        }
        procs.append(subprocess.Popen(cmd, env=env))
        print(f"launch: rank {rank} pid {procs[-1].pid}", flush=True)
    rc = max(p.wait() for p in procs)
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
