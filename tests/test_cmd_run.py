"""run.pl-equivalent cmd layer (espnet_tpu/bin/cmd_run.py).

Reference semantics: doc/parallelization.md:28-46 — ``cmd JOB=1:nj
JOB.log echo JOB`` runs nj jobs with JOB substituted in the log name
and argv, one log per job, non-zero exit if any job fails.
"""
from __future__ import annotations

import sys

from espnet_tpu.bin.cmd_run import main


def test_job_substitution_and_logs(tmp_path):
    log = tmp_path / "echo.JOB.log"
    rc = main(["JOB=1:3", str(log), "echo", "job-JOB-done"])
    assert rc == 0
    for i in (1, 2, 3):
        text = (tmp_path / f"echo.{i}.log").read_text()
        assert f"job-{i}-done" in text
        assert "# Started at" in text
        assert "with status 0" in text


def test_failure_propagates(tmp_path, capsys):
    log = tmp_path / "f.JOB.log"
    # job 2 exits non-zero: python -c "exit(JOB-2)"-ish via sh
    rc = main(
        ["JOB=1:3", str(log), "sh", "-c", "exit $((JOB==2 ? 1 : 0))"]
    )
    assert rc == 1
    err = capsys.readouterr().err
    assert "1/3 jobs failed" in err
    assert "f.2.log" in err
    assert "with status 1" in (tmp_path / "f.2.log").read_text()


def test_single_job_without_range(tmp_path):
    log = tmp_path / "one.log"
    rc = main([str(log), sys.executable, "-c", "print('hello')"])
    assert rc == 0
    assert "hello" in log.read_text()


def test_max_jobs_run_caps_width(tmp_path):
    # all 4 jobs write start/end stamps; with width 1 they serialize —
    # assert no two jobs' stamp intervals overlap
    import json
    import time  # noqa: F401

    log = tmp_path / "w.JOB.log"
    script = (
        "import json,time,sys;"
        "t0=time.time();time.sleep(0.2);"
        "print(json.dumps([t0,time.time()]))"
    )
    rc = main(
        ["--max_jobs_run", "1", "JOB=1:3", str(log), sys.executable, "-c", script]
    )
    assert rc == 0
    spans = []
    for i in (1, 2, 3):
        line = [
            ln
            for ln in (tmp_path / f"w.{i}.log").read_text().splitlines()
            if ln.startswith("[")
        ][0]
        spans.append(json.loads(line))
    spans.sort()
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 <= s1 + 0.05  # serialized (small scheduling slack)
