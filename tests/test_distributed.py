"""Multi-process distributed tests (reference:
test/espnet2/train/test_distributed_utils.py — 2-worker gloo init with
env-resolved ranks; here: jax.distributed over the CPU backend)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from espnet_tpu.parallel.distributed import DistributedOption, local_slice

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_resolve_from_slurm_env(monkeypatch):
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "2")
    monkeypatch.setenv("MASTER_ADDR", "node0")
    monkeypatch.setenv("MASTER_PORT", "29500")
    opt = DistributedOption().resolve()
    assert opt.distributed
    assert opt.num_processes == 4
    assert opt.process_id == 2
    assert opt.coordinator_address == "node0:29500"


def test_resolve_single_process(monkeypatch):
    for k in ("SLURM_NTASKS", "SLURM_NPROCS", "OMPI_COMM_WORLD_SIZE",
              "WORLD_SIZE", "SLURM_PROCID", "RANK"):
        monkeypatch.delenv(k, raising=False)
    opt = DistributedOption().resolve()
    assert not opt.distributed


def test_local_slice():
    batch = {"x": np.arange(10).reshape(10, 1), "s": np.float32(3.0)}
    a = local_slice(batch, axis_size=2, rank=0)
    b = local_slice(batch, axis_size=2, rank=1)
    assert a["x"].shape == (5, 1) and b["x"].shape == (5, 1)
    assert not np.array_equal(a["x"], b["x"])
    # scalars pass through
    assert a["s"] == batch["s"]
    # world=1 is identity
    assert local_slice(batch, axis_size=1, rank=0) is batch


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    """Spawn 2 real processes, init jax.distributed on CPU, and check a
    jitted global-mean over host-fed shards matches numpy — plus a
    multi-process sharded checkpoint save→restore round-trip."""
    port = free_port()
    env_base = {
        "CKPT_DIR": str(tmp_path),
        **os.environ,
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "MASTER_ADDR": "127.0.0.1",
        "MASTER_PORT": str(port),
        "SLURM_NTASKS": "2",
        "JAX_PLATFORMS": "cpu",
        # 2 CPU devices per process → 4 global devices for the 8-row batch
        # (conftest's 8-per-process would give 16 shards for 8 rows)
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = []
    for rank in range(2):
        env = {**env_base, "SLURM_PROCID": str(rank)}
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank} failed:\n{out}"
        assert f"rank{rank} OK" in out
        assert f"rank{rank} CKPT_OK" in out
    # both processes wrote their own shard file
    shard_files = sorted((tmp_path / "state.ckpt.shards").glob("process_*.pkl"))
    assert [f.name for f in shard_files] == ["process_0.pkl", "process_1.pkl"]
