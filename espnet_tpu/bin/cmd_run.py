"""run.pl-equivalent array-job runner (the reference's cluster-cmd layer).

Unified interface of the Kaldi cmd family the reference recipes submit
every stage through (reference doc/parallelization.md:1-50; run.pl /
queue.pl / slurm.pl all accept the same call shape):

    python -m espnet_tpu.bin.cmd_run [opts] JOB=1:N log.JOB.log cmd args...

The literal string ``JOB`` is substituted with the job index in the log
path and in every command argument. Jobs run concurrently (bounded by
--max_jobs_run), each writing its own log with the run.pl-style header /
"# Accounting: time=... exit-code=..." footer; the runner exits non-zero
and names the failed logs if any job fails, like run.pl does.

Backends (--backend):
    local  fork on this machine (≙ run.pl, the default)
    slurm  one ``srun`` per job (≙ slurm.pl passthrough; extra srun args
           via --slurm_opts)

Without the JOB= range argument a single job is run (run.pl allows the
same).
"""
from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def parse_args(argv):
    ap = argparse.ArgumentParser(
        description="run.pl-style array-job runner",
        allow_abbrev=False,
    )
    ap.add_argument(
        "--backend", default="local", choices=["local", "slurm"],
    )
    ap.add_argument(
        "--max_jobs_run", type=int, default=0,
        help="cap on concurrent jobs (0 = min(njobs, cpu_count), the "
        "run.pl default behavior of just forking everything is rarely "
        "right for compute jobs)",
    )
    ap.add_argument(
        "--slurm_opts", default="",
        help="extra args for srun (slurm backend), e.g. '--mem 4G'",
    )
    ap.add_argument("rest", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)
    rest = list(args.rest)
    if rest and rest[0] == "--":
        rest = rest[1:]
    if not rest:
        ap.error("expected: [JOB=1:N] <log> <command> [args...]")
    lo, hi = 1, 1
    if "=" in rest[0] and ":" in rest[0].split("=", 1)[1]:
        var, rng = rest[0].split("=", 1)
        lo_s, hi_s = rng.split(":", 1)
        lo, hi = int(lo_s), int(hi_s)
        args.jobname = var
        rest = rest[1:]
    else:
        args.jobname = "JOB"
    if len(rest) < 2:
        ap.error("expected a log path and a command")
    args.lo, args.hi = lo, hi
    args.log = rest[0]
    args.command = rest[1:]
    return args


def _subst(parts, name, idx):
    return [p.replace(name, str(idx)) for p in parts]


def run_one(args, idx) -> int:
    log = Path(args.log.replace(args.jobname, str(idx)))
    log.parent.mkdir(parents=True, exist_ok=True)
    cmd = _subst(args.command, args.jobname, idx)
    if args.backend == "slurm":
        cmd = ["srun", *shlex.split(args.slurm_opts), *cmd]
    t0 = time.time()
    with open(log, "w") as f:
        f.write("# " + " ".join(shlex.quote(c) for c in cmd) + "\n")
        f.write(f"# Started at {time.strftime('%c')}\n#\n")
        f.flush()
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT).returncode
        f.write(
            f"# Accounting: time={int(time.time() - t0)} threads=1\n"
            f"# Finished at {time.strftime('%c')} with status {rc}\n"
        )
    return rc


def main(argv=None):
    args = parse_args(sys.argv[1:] if argv is None else argv)
    jobs = list(range(args.lo, args.hi + 1))
    width = args.max_jobs_run or min(len(jobs), os.cpu_count() or 1)
    with ThreadPoolExecutor(max_workers=width) as ex:
        rcs = list(ex.map(lambda i: run_one(args, i), jobs))
    failed = [i for i, rc in zip(jobs, rcs) if rc != 0]
    if failed:
        logs = ", ".join(
            args.log.replace(args.jobname, str(i)) for i in failed[:4]
        )
        print(
            f"cmd_run: {len(failed)}/{len(jobs)} jobs failed; "
            f"see {logs}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
