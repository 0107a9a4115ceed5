"""Sharded checkpoint layout (multi-host-safe save/restore — reference
resume semantics espnet2/train/trainer.py:247-306, abs_task.py:886-914):
single-process exercises of the per-process-shards format on the
8-device CPU mesh; the true 2-process case is covered by
test_distributed.py::test_two_process_jax_distributed."""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from espnet_tpu.parallel.mesh import make_mesh
from espnet_tpu.train.checkpoint import (
    gc_old_epochs,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_sharded,
    update_best_symlink,
)


def _tp_state(mesh):
    """A TrainState-shaped tree with TP-sharded params + Adam moments."""
    w = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
    sh = NamedSharding(mesh, P(None, "model"))
    return {
        "params": {"dense": {"kernel": jax.device_put(w, sh)}},
        "opt": {"mu": jax.device_put(w * 0.1, sh), "nu": jax.device_put(w * 0.01, sh)},
        "step": np.int32(42),
    }, w


def test_sharded_roundtrip_tp(tmp_path):
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "model"))
    state, w = _tp_state(mesh)
    path = tmp_path / "model.ckpt"
    save_checkpoint_sharded(path, state, meta={"epoch": 3})
    assert (tmp_path / "model.ckpt.shards" / "process_0.pkl").exists()
    target = {
        "params": {"dense": {"kernel": np.zeros_like(w)}},
        "opt": {"mu": np.zeros_like(w), "nu": np.zeros_like(w)},
        "step": np.int32(0),
    }
    out = load_checkpoint(path, target)
    np.testing.assert_array_equal(out["params"]["dense"]["kernel"], w)
    np.testing.assert_array_equal(out["opt"]["mu"], w * 0.1)
    np.testing.assert_array_equal(out["opt"]["nu"], w * 0.01)
    assert int(out["step"]) == 42


def test_sharded_roundtrip_replicated_leaves(tmp_path):
    """Replicated arrays must be written once (replica 0) and restore."""
    mesh = make_mesh(shape=(8,), axis_names=("data",))
    b = np.linspace(0, 1, 8).astype(np.float32)
    state = {
        "b": jax.device_put(b, NamedSharding(mesh, P())),
        "x": jax.device_put(b * 2, NamedSharding(mesh, P("data"))),
    }
    path = tmp_path / "m.ckpt"
    save_checkpoint_sharded(path, state)
    out = load_checkpoint(path, {"b": np.zeros_like(b), "x": np.zeros_like(b)})
    np.testing.assert_array_equal(out["b"], b)
    np.testing.assert_array_equal(out["x"], b * 2)


def test_best_symlink_resolves_to_shards(tmp_path):
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "model"))
    state, w = _tp_state(mesh)
    save_checkpoint_sharded(tmp_path / "5epoch.ckpt", state)
    update_best_symlink(tmp_path, 5, "valid.loss.best")
    target = {
        "params": {"dense": {"kernel": np.zeros_like(w)}},
        "opt": {"mu": np.zeros_like(w), "nu": np.zeros_like(w)},
        "step": np.int32(0),
    }
    out = load_checkpoint(tmp_path / "valid.loss.best.ckpt", target)
    np.testing.assert_array_equal(out["params"]["dense"]["kernel"], w)


def test_gc_removes_shard_dirs(tmp_path):
    mesh = make_mesh(shape=(2, 4), axis_names=("data", "model"))
    state, _ = _tp_state(mesh)
    for ep in (1, 2, 3):
        save_checkpoint_sharded(tmp_path / f"{ep}epoch.ckpt", state)
    update_best_symlink(tmp_path, 3, "valid.loss.best")
    gc_old_epochs(tmp_path, keep_epochs=[2, 3])
    assert not (tmp_path / "1epoch.ckpt.shards").exists()
    assert (tmp_path / "2epoch.ckpt.shards").exists()
    assert (tmp_path / "3epoch.ckpt.shards").exists()


def test_plain_save_unchanged(tmp_path):
    """Fully-addressable single-host states keep the one-file layout."""
    state = {"w": np.ones((4, 4), np.float32), "step": np.int32(1)}
    path = tmp_path / "plain.ckpt"
    save_checkpoint(path, state)
    assert path.exists() and not (tmp_path / "plain.ckpt.shards").exists()
    out = load_checkpoint(path, {"w": np.zeros((4, 4), np.float32), "step": np.int32(0)})
    np.testing.assert_array_equal(out["w"], state["w"])
