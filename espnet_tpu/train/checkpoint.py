"""Checkpoint save/restore + n-best averaging.

Reference parity: espnet2/train/trainer.py:247-306 (checkpoint.pth,
{n}epoch weights, best symlinks, keep-nbest GC) and
espnet2/main_funcs/average_nbest_models.py:15; resume semantics
espnet2/tasks/abs_task.py:886-914.

Format: pickle of the flax state dict + a json sidecar for scalars.

Multi-host safety: a mesh-sharded `jax.Array` in a multi-process run is
NOT fully addressable — `np.asarray` on it raises. `save_checkpoint`
auto-detects that case and switches to the sharded layout: a
`<path>.shards/` directory where every process writes only its own
addressable shards (`process_{k}.pkl`, replica 0 only, so each byte of
the global array is written exactly once across the fleet — assumes the
usual shared checkpoint filesystem). `load_checkpoint` reassembles the
global arrays from all shard files and restores into the target tree;
callers re-shard with `jax.device_put(state, shardings)` afterwards.
`save_checkpoint_sharded` can be called directly to exercise the same
layout in single-process tests (8-device CPU mesh).
"""
from __future__ import annotations

import json
import os
import pickle
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_EMPTY_DICT = "__espnet_tpu_empty_dict__"


def _flatten_state_dict(d: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(d, dict):
        if not d and prefix:
            # keep empty sub-dicts (e.g. TrainState.extra_vars) —
            # from_state_dict requires every field present
            out[prefix[:-1]] = _EMPTY_DICT
        for k, v in d.items():
            out.update(_flatten_state_dict(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = d
    return out


def _unflatten_state_dict(flat: Dict[str, Any]) -> Any:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = {} if isinstance(v, str) and v == _EMPTY_DICT else v
    return root


def _needs_sharded_save(state: Any) -> bool:
    if jax.process_count() > 1:
        return True
    return any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in jax.tree_util.tree_leaves(state)
    )


def save_checkpoint_sharded(path: Path, state: Any, meta: Optional[Dict] = None):
    """Sharded save: each process writes its addressable replica-0
    shards of every distributed leaf (plus, on process 0, the full value
    of any undistributed leaf) to `<path>.shards/process_{k}.pkl`."""
    path = Path(path)
    shard_dir = Path(str(path) + ".shards")
    pid = jax.process_index()
    # every process mkdirs (racing mkdirs are safe; a pid-0-only mkdir
    # or rmtree would race against peers already writing their shard)
    shard_dir.mkdir(parents=True, exist_ok=True)
    if pid == 0 and (path.exists() or path.is_symlink()):
        path.unlink()
    flat = _flatten_state_dict(serialization.to_state_dict(state))
    records = {}
    for key, leaf in flat.items():
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            shards = [
                (s.index, np.asarray(s.data))
                for s in leaf.addressable_shards
                if s.replica_id == 0
            ]
            if shards:
                records[key] = ("shards", leaf.shape, np.dtype(leaf.dtype).str, shards)
        elif pid == 0:
            records[key] = (
                "full", leaf if isinstance(leaf, str) else np.asarray(leaf)
            )
    with open(shard_dir / f"process_{pid}.pkl", "wb") as f:
        pickle.dump(records, f)
    if meta is not None and pid == 0:
        Path(str(path) + ".json").write_text(json.dumps(meta, default=float))


def _load_sharded(shard_dir: Path, target: Any) -> Any:
    assembled: Dict[str, Any] = {}
    shapes: Dict[str, Any] = {}
    for pfile in sorted(shard_dir.glob("process_*.pkl")):
        with open(pfile, "rb") as f:
            records = pickle.load(f)
        for key, rec in records.items():
            if rec[0] == "full":
                assembled[key] = rec[1]
            else:
                _, shape, dtype, shards = rec
                if key not in assembled:
                    assembled[key] = np.empty(shape, dtype=np.dtype(dtype))
                    shapes[key] = np.zeros(shape, dtype=bool)
                for index, data in shards:
                    assembled[key][index] = data
                    shapes[key][index] = True
    missing = [k for k, seen in shapes.items() if not seen.all()]
    if missing:
        raise ValueError(
            f"sharded checkpoint {shard_dir} is incomplete: leaves {missing} "
            "have uncovered regions (a process file is missing)"
        )
    return serialization.from_state_dict(target, _unflatten_state_dict(assembled))


def save_checkpoint(path: Path, state: Any, meta: Optional[Dict] = None):
    """Serialize a pytree (TrainState or params) to `path`.

    Multi-process (or non-addressable-array) states go through the
    sharded layout automatically; single-host states keep the original
    single-file pickle."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if _needs_sharded_save(state):
        save_checkpoint_sharded(path, state, meta)
        return
    host = _to_host(state)
    with open(path, "wb") as f:
        pickle.dump(serialization.to_state_dict(host), f)
    if meta is not None:
        Path(str(path) + ".json").write_text(json.dumps(meta, default=float))


def load_checkpoint(path: Path, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into `target`'s structure.

    Accepts both layouts: the single-file pickle and the `<path>.shards/`
    directory written by sharded saves."""
    path = Path(path)
    if path.is_symlink() and not path.exists():
        # best-symlink to a sharded epoch: resolve to find its .shards
        path = path.parent / os.readlink(path)
    shard_dir = Path(str(path) + ".shards")
    if not path.exists() and shard_dir.is_dir():
        return _load_sharded(shard_dir, target)
    with open(path, "rb") as f:
        state_dict = pickle.load(f)
    return serialization.from_state_dict(target, state_dict)


def load_checkpoint_meta(path: Path) -> Dict:
    p = Path(str(path) + ".json")
    return json.loads(p.read_text()) if p.exists() else {}


def save_epoch_params(expdir: Path, epoch: int, params: Any):
    save_checkpoint(Path(expdir) / f"{epoch}epoch.ckpt", params)


def update_best_symlink(expdir: Path, epoch: int, name: str):
    """latest.ckpt / <name>.best.ckpt symlinks (trainer.py:263-288)."""
    expdir = Path(expdir)
    link = expdir / f"{name}.ckpt"
    if link.is_symlink() or link.exists():
        link.unlink()
    link.symlink_to(f"{epoch}epoch.ckpt")


def gc_old_epochs(expdir: Path, keep_epochs: List[int]):
    """Remove {n}epoch.ckpt not in keep list and not symlinked."""
    expdir = Path(expdir)
    linked = set()
    for link in expdir.glob("*.ckpt"):
        if link.is_symlink():
            linked.add(os.readlink(link))
    for f in expdir.glob("*epoch.ckpt"):
        try:
            ep = int(f.name.replace("epoch.ckpt", ""))
        except ValueError:
            continue
        if ep not in keep_epochs and f.name not in linked:
            f.unlink()
    for d in expdir.glob("*epoch.ckpt.shards"):
        base = d.name[: -len(".shards")]
        try:
            ep = int(base.replace("epoch.ckpt", ""))
        except ValueError:
            continue
        if ep not in keep_epochs and base not in linked:
            shutil.rmtree(d, ignore_errors=True)


def average_nbest(expdir: Path, epochs: List[int], target: Any) -> Any:
    """Average the params of the given epochs (average_nbest_models.py:15)."""
    acc = None
    for ep in epochs:
        p = load_checkpoint(Path(expdir) / f"{ep}epoch.ckpt", target)
        flat = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float64), p)
        if acc is None:
            acc = flat
        else:
            acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, flat)
    n = len(epochs)
    avg = jax.tree_util.tree_map(lambda a: (a / n), acc)
    # cast back to target dtypes
    return jax.tree_util.tree_map(
        lambda a, t: np.asarray(a, dtype=np.asarray(t).dtype), avg, target
    )
