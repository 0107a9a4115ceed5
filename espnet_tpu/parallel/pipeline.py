"""Pipeline parallelism (GPipe) over a mesh axis — capability beyond the
reference (SURVEY §2.10: "pipeline … Absent").

TPU-idiomatic design: the pipeline is a `shard_map` over a "pipe" mesh
axis. Every stage runs the SAME stage function (k identical blocks) with
its own slice of stage-stacked parameters (leading axis sharded over the
pipe axis). Microbatches flow stage-to-stage via `lax.ppermute` over ICI
inside one fori_loop of M + S - 1 ticks (bubble fraction (S-1)/(M+S-1)).
`ppermute` has a transpose rule, so `jax.grad` through the pipeline
just works — no hand-written backward schedule.

This is the forward/backward building block; the dryrun composes it with
dp/tp/sp to cover all mesh-parallel axes.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35: shard_map lives at jax.shard_map (the experimental
    # path still imports on jax 0.8 but warns on use)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stage_params: Any,
    x_microbatches: jnp.ndarray,   # (M, mb, ...) — M microbatches
    n_stages: int,
    mesh: Mesh,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Run x through S pipelined stages; returns (M, mb, ...) outputs.

    stage_params: pytree whose leaves have leading axis n_stages
    (stage s's slice feeds stage_fn on the device at pipe-index s).
    """
    m = x_microbatches.shape[0]
    n_steps = m + n_stages - 1
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def per_device(params_st, x_all):
        params_local = jax.tree_util.tree_map(lambda p: p[0], params_st)
        stage = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(x_all[0])
        outs = jnp.zeros_like(x_all)

        def tick(t, carry):
            buf, outs = carry
            mb_idx = jnp.clip(t, 0, m - 1)
            inp = jnp.where(stage == 0, x_all[mb_idx], buf)
            y = stage_fn(params_local, inp)
            out_t = t - (n_stages - 1)
            is_out = (stage == n_stages - 1) & (out_t >= 0)
            written = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(out_t, 0, m - 1), 0
            )
            outs = jnp.where(is_out, written, outs)
            buf = jax.lax.ppermute(y, axis, fwd_perm)
            return buf, outs

        buf, outs = jax.lax.fori_loop(0, n_steps, tick, (buf, outs))
        # only the last stage holds real outputs; replicate via psum
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,  # jax>=0.7 name for check_rep
    )(stage_params, x_microbatches)


def sequential_reference(stage_fn, stage_params, x_microbatches, n_stages):
    """Same computation without the pipeline (for verification)."""
    def run_one(x):
        for s in range(n_stages):
            params_s = jax.tree_util.tree_map(lambda p: p[s], stage_params)
            x = stage_fn(params_s, x)
        return x

    return jax.vmap(run_one)(x_microbatches)
