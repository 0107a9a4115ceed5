"""Parameter partitioning rules (tensor parallelism).

Capability beyond the reference (SURVEY §2.10: "tensor parallel …
Absent"): Megatron-style sharding of the big matmuls over the mesh's
"model" axis — FFN in-proj column-sharded, out-proj row-sharded,
attention QKV column-sharded, attention out row-sharded, embeddings
vocab-sharded. XLA inserts the all-reduces over ICI.

Rules match parameters by path substring; the default set covers the
flax module names used across this package (PositionwiseFeedForward's
Dense_0/Dense_1, attention linear_{q,k,v,out}, Embed).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder by ndim)
DEFAULT_RULES: List[Tuple[str, Dict[int, P]]] = [
    # FFN: Dense_0 column-parallel, Dense_1 row-parallel
    (r"PositionwiseFeedForward_\d+/Dense_0/kernel", {2: P(None, "model")}),
    (r"PositionwiseFeedForward_\d+/Dense_1/kernel", {2: P("model", None)}),
    # attention projections
    (r"linear_(q|k|v)/kernel", {2: P(None, "model")}),
    (r"linear_out/kernel", {2: P("model", None)}),
    (r"linear_pos/kernel", {2: P(None, "model")}),
    # output projection / embeddings: vocab-sharded
    (r"Embed_\d+/embedding", {2: P("model", None)}),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def infer_param_shardings(
    params: Any, mesh: Mesh, rules: Sequence[Tuple[str, Dict[int, P]]] = DEFAULT_RULES
) -> Any:
    """Pytree of NamedShardings matching `params` — replicated unless a
    rule matches and the axis size divides the mesh dim."""
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        p = _path_str(path)
        nd = np.ndim(leaf)
        for pat, by_ndim in rules:
            if re.search(pat, p) and nd in by_ndim:
                spec = by_ndim[nd]
                # only shard if divisible
                ok = True
                for dim, ax in enumerate(spec):
                    if ax == "model" and leaf.shape[dim] % max(model_size, 1) != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    shardings = infer_param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def infer_opt_state_shardings(
    opt_state: Any, params: Any, param_shardings: Any, mesh: Mesh
) -> Any:
    """Shardings for optimizer state: moment buffers shard like their
    params (with TP, replicated Adam moments would cost memory as if the
    model were unsharded); everything else replicated.

    optax moment trees (mu/nu/accumulated grads) mirror the params pytree,
    so each moment leaf's path ends with its param's path — match the
    longest param-path suffix with an equal shape.
    """
    by_path = {}
    for path, sh in jax.tree_util.tree_flatten_with_path(param_shardings)[0]:
        by_path[_path_str(path)] = sh
    shapes = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        shapes[_path_str(path)] = np.shape(leaf)
    rep = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        p = _path_str(path)
        for param_path, sh in by_path.items():
            if (
                p.endswith("/" + param_path)
                and np.shape(leaf) == shapes[param_path]
            ):
                return sh
        return rep

    return jax.tree_util.tree_map_with_path(spec_for, opt_state)
