"""Parameter initialization & transfer learning.

Reference parity:
- espnet/asr/pytorch_backend/asr_init.py (load_trained_model /
  load_trained_modules — the --enc-init/--dec-init transfer path)
- espnet2/torch_utils/initialize.py (xavier/kaiming/chainer init)
- espnet2/torch_utils/load_pretrained_model.py (--init_param
  "path:src_key:dst_key:exclude_keys" grafting)
- espnet/nets/pytorch_backend/initialization.py
  (lecun_normal_init_parameters, set_forget_bias_to_one)
- espnet2/torch_utils/model_summary.py

TPU-native design: parameters are pytrees of arrays, so "module
transfer" is subtree grafting by path prefix — no nn.Module state_dict
machinery needed. All re-init happens on host numpy before the tree is
device-put by the Trainer.
"""
from __future__ import annotations

import logging
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _set_path(tree: Dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def _get_path(tree: Any, path: str) -> Any:
    if not path:
        return tree
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _as_mutable(tree: Any) -> Any:
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        return {k: _as_mutable(v) for k, v in tree.items()}
    return tree


# ---------------------------------------------------------------------------
# initialize(): re-init a fresh parameter tree by method name
# ---------------------------------------------------------------------------


def _fans(shape: Tuple[int, ...]) -> Tuple[int, int]:
    """(fan_in, fan_out) with flax conventions: dense kernels are
    (in, out); conv kernels are (*spatial, in, out)."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return shape[-2] * receptive, shape[-1] * receptive


def initialize(params: Any, init: str, seed: int = 0) -> Any:
    """Re-initialize every leaf of `params` per the named scheme
    (reference espnet2/torch_utils/initialize.py:14):

    - xavier_uniform / xavier_normal
    - kaiming_uniform / kaiming_normal
    - chainer: LeCun normal (std 1/sqrt(fan_in)) for >=2-D kernels,
      zero biases, LSTM forget-gate bias = 1
      (espnet initialization.py lecun_normal_init_parameters +
      set_forget_bias_to_one)

    1-D leaves: norm scales -> 1, everything else -> 0.
    """
    rng = np.random.RandomState(seed)
    tree = _as_mutable(params)
    flat = _flatten(tree)
    for path, x in flat.items():
        x = np.asarray(x)
        name = path.rsplit("/", 1)[-1]
        if x.ndim >= 2:
            fan_in, fan_out = _fans(x.shape)
            if init == "xavier_uniform":
                a = float(np.sqrt(6.0 / (fan_in + fan_out)))
                new = rng.uniform(-a, a, size=x.shape)
            elif init == "xavier_normal":
                std = float(np.sqrt(2.0 / (fan_in + fan_out)))
                new = rng.normal(0.0, std, size=x.shape)
            elif init == "kaiming_uniform":
                a = float(np.sqrt(6.0 / fan_in))
                new = rng.uniform(-a, a, size=x.shape)
            elif init == "kaiming_normal":
                std = float(np.sqrt(2.0 / fan_in))
                new = rng.normal(0.0, std, size=x.shape)
            elif init == "chainer":
                std = float(1.0 / np.sqrt(fan_in))
                new = rng.normal(0.0, std, size=x.shape)
            else:
                raise ValueError(f"unknown init: {init}")
        else:
            # scale-like leaves keep 1 (LayerNorm/BatchNorm weight),
            # bias-like go to 0 — matching espnet2 initialize():41-49
            new = np.ones_like(x) if name == "scale" else np.zeros_like(x)
        _set_path(tree, path, new.astype(np.asarray(x).dtype))
    if init == "chainer":
        set_forget_bias_to_one(tree)
    return tree


def set_forget_bias_to_one(tree: Dict) -> None:
    """LSTM forget-gate bias = 1 in place (reference
    initialization.py set_forget_bias_to_one). flax LSTMCell names its
    gate Dense modules i{i,f,g,o}/h{i,f,g,o}; the forget gates are
    'if'/'hf'."""
    for path, x in _flatten(tree).items():
        parts = path.split("/")
        if len(parts) >= 2 and parts[-1] == "bias" and parts[-2] in ("if", "hf"):
            _set_path(tree, path, np.ones_like(np.asarray(x)))


# ---------------------------------------------------------------------------
# --init_param transfer grafting
# ---------------------------------------------------------------------------


def _load_param_tree(path: str) -> Dict:
    with open(path, "rb") as f:
        obj = pickle.load(f)
    # TrainState checkpoints nest the tree under "params"; epoch/averaged
    # checkpoints are the bare params dict
    if isinstance(obj, dict) and "params" in obj and "opt_state" in obj:
        obj = obj["params"]
    return obj


def load_init_params(params: Any, spec: str) -> Tuple[Any, List[str]]:
    """Graft a pretrained subtree into fresh params.

    spec = "ckpt_path[:src_key[:dst_key[:exclude_keys]]]" — the espnet2
    --init_param convention (load_pretrained_model.py:17):
      src_key:  '/'- or '.'-path inside the checkpoint ('' = root)
      dst_key:  path inside `params` to graft onto ('' = root)
      exclude:  comma-separated path prefixes (relative to src) to skip

    Leaves whose path is missing in the destination or whose shape
    differs are skipped with a warning (reference asr_init.py transfers
    only matching modules). Returns (new_params, transferred_paths).
    """
    parts = (spec or "").split(":")
    path = parts[0]
    src_key = parts[1].replace(".", "/") if len(parts) > 1 else ""
    dst_key = parts[2].replace(".", "/") if len(parts) > 2 else ""
    excludes = [
        e.replace(".", "/")
        for e in (parts[3].split(",") if len(parts) > 3 and parts[3] else [])
        if e
    ]

    src_tree = _get_path(_load_param_tree(path), src_key)
    tree = _as_mutable(params)
    dst_root = _get_path(tree, dst_key)
    dst_flat = _flatten(dst_root)

    transferred: List[str] = []
    for p, v in _flatten(src_tree).items():
        if any(p == e or p.startswith(e + "/") for e in excludes):
            continue
        if p not in dst_flat:
            logging.warning("init_param: %s not in destination, skipped", p)
            continue
        if tuple(np.shape(v)) != tuple(np.shape(dst_flat[p])):
            logging.warning(
                "init_param: %s shape %s != %s, skipped",
                p, np.shape(v), np.shape(dst_flat[p]),
            )
            continue
        _set_path(
            dst_root, p, np.asarray(v, dtype=np.asarray(dst_flat[p]).dtype)
        )
        transferred.append(p)
    logging.info(
        "init_param %s: transferred %d/%d leaves", path, len(transferred),
        len(dst_flat),
    )
    return tree, transferred


def apply_param_init(variables: Dict, config: Dict) -> Dict:
    """Task-level hook: `init:` re-init scheme and/or `init_param:`
    transfer specs from the yaml config (reference tasks wire both,
    abs_task.py build_model + load_pretrained_model)."""
    init = config.get("init")
    specs = config.get("init_param") or []
    if isinstance(specs, str):
        specs = [specs]
    if not init and not specs:
        return variables
    variables = dict(variables)
    params = variables["params"]
    if init:
        params = initialize(params, init, seed=int(config.get("seed", 0)))
    for spec in specs:
        params, _ = load_init_params(params, spec)
    variables["params"] = params
    return variables


# ---------------------------------------------------------------------------
# model_summary
# ---------------------------------------------------------------------------


def model_summary(params: Any, extra_vars: Optional[Dict] = None) -> str:
    """Human-readable parameter summary (reference
    espnet2/torch_utils/model_summary.py): total count, size, and the
    per-top-level-module breakdown."""
    flat = _flatten(params if isinstance(params, dict) else _as_mutable(params))
    by_top: Dict[str, int] = {}
    total = 0
    nbytes = 0
    for p, v in flat.items():
        n = int(np.prod(np.shape(v))) if np.shape(v) else 1
        top = p.split("/")[0]
        by_top[top] = by_top.get(top, 0) + n
        total += n
        nbytes += n * np.asarray(v).dtype.itemsize
    lines = [
        "Model structure:",
        f"  Total parameters: {total:,} ({nbytes / 1e6:.2f} MB)",
    ]
    for top, n in sorted(by_top.items(), key=lambda kv: -kv[1]):
        lines.append(f"  {top}: {n:,} ({n / max(total, 1) * 100:.1f}%)")
    return "\n".join(lines)
