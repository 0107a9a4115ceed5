"""GPipe pipeline parallelism: forward/grad equivalence vs the
sequential stack on a virtual multi-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.parallel.mesh import make_mesh
from espnet_tpu.parallel.pipeline import gpipe, sequential_reference

S = 4   # stages
M = 6   # microbatches
MB = 2  # microbatch size
D = 16


def mlp_stage(params, x):
    """Two-layer residual MLP — stands in for a conformer block pair."""
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < S:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(shape=(S,), axis_names=("pipe",),
                     devices=jax.devices()[:S])
    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(S, D, 2 * D).astype(np.float32) * 0.1),
        "b1": jnp.asarray(rng.randn(S, 2 * D).astype(np.float32) * 0.1),
        "w2": jnp.asarray(rng.randn(S, 2 * D, D).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.randn(M, MB, D).astype(np.float32))
    return mesh, params, x


def test_pipeline_forward_matches_sequential(setup):
    mesh, params, x = setup
    want = sequential_reference(mlp_stage, params, x, S)
    got = jax.jit(
        lambda p, xx: gpipe(mlp_stage, p, xx, S, mesh)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grad_matches_sequential(setup):
    mesh, params, x = setup

    def loss_pipe(p):
        return (gpipe(mlp_stage, p, x, S, mesh) ** 2).sum()

    def loss_seq(p):
        return (sequential_reference(mlp_stage, p, x, S) ** 2).sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_pipe[k]), np.asarray(g_seq[k]),
            rtol=1e-4, atol=1e-4,
        )


def test_moe_feed_forward_expert_parallel():
    """MoE FF: expert-sharded execution equals unsharded; top-1 routing
    selects exactly one expert per token; aux loss finite."""
    from jax.sharding import PartitionSpec as P

    from espnet_tpu.layers.moe import MoEFeedForward

    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(shape=(4,), axis_names=("expert",),
                     devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 8).astype(np.float32))

    plain = MoEFeedForward(n_experts=4, hidden_units=16, dropout_rate=0.0)
    v = plain.init(jax.random.PRNGKey(0), x)
    y_ref, aux_ref = plain.apply(v, x)

    sharded = MoEFeedForward(n_experts=4, hidden_units=16, dropout_rate=0.0,
                             expert_axis="expert")
    with jax.set_mesh(mesh):
        y_sh, aux_sh = jax.jit(lambda p, xx: sharded.apply(p, xx))(v, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux_sh), float(aux_ref), rtol=1e-5)
    assert np.isfinite(float(aux_ref)) and float(aux_ref) > 0

    # grads flow through router and experts
    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(
            lambda p: (sharded.apply(p, x)[0] ** 2).sum()
            + sharded.apply(p, x)[1]
        ))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
