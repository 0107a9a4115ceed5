"""Checkpoint save/restore + n-best averaging.

Reference parity: espnet2/train/trainer.py:247-306 (checkpoint.pth,
{n}epoch weights, best symlinks, keep-nbest GC) and
espnet2/main_funcs/average_nbest_models.py:15.

Format: flax msgpack for the array tree + a json sidecar for scalars.
(A sharded orbax backend can be swapped in for multi-host runs without
changing callers.)
"""
from __future__ import annotations

import json
import os
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Path, state: Any, meta: Optional[Dict] = None):
    """Serialize a pytree (TrainState or params) to `path`."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = _to_host(state)
    with open(path, "wb") as f:
        pickle.dump(serialization.to_state_dict(host), f)
    if meta is not None:
        Path(str(path) + ".json").write_text(json.dumps(meta, default=float))


def load_checkpoint(path: Path, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into `target`'s structure."""
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
