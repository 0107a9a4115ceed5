"""fused_adam parity vs optax.chain(clip_by_global_norm, adam) under
apply_if_finite — same params trajectory, same nan-skip semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from espnet_tpu.train.optimizers import build_optimizer, fused_adam


def _tree(seed, scale=1.0):
    r = np.random.RandomState(seed)
    return {
        "a": jnp.asarray(r.randn(4, 3).astype(np.float32) * scale),
        "b": {"w": jnp.asarray(r.randn(7).astype(np.float32) * scale)},
    }


def _run(tx, params, grads_list):
    state = tx.init(params)
    for g in grads_list:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_fused_adam_matches_optax_chain():
    params = _tree(0)
    grads_list = [_tree(i + 1, scale=s) for i, s in enumerate([1.0, 10.0, 0.1, 5.0])]

    ref = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    ref = optax.apply_if_finite(ref, max_consecutive_errors=10000)
    fused = fused_adam(1e-2, grad_clip=1.0)

    p_ref = _run(ref, params, grads_list)
    p_fused = _run(fused, params, grads_list)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fused_adam_schedule_matches():
    sched = optax.linear_schedule(1e-2, 1e-3, transition_steps=3)
    params = _tree(0)
    grads_list = [_tree(i + 1) for i in range(5)]
    ref = optax.adam(sched)
    fused = fused_adam(sched, grad_clip=None)
    p_ref = _run(ref, params, grads_list)
    p_fused = _run(fused, params, grads_list)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fused_adam_nan_skip():
    params = _tree(0)
    fused = fused_adam(1e-2, grad_clip=1.0)
    state = fused.init(params)
    good = _tree(1)
    bad = jax.tree_util.tree_map(lambda x: x * jnp.nan, good)

    updates, state = fused.update(good, state, params)
    p1 = optax.apply_updates(params, updates)
    assert int(state.count) == 1

    updates, state = fused.update(bad, state, p1)
    p2 = optax.apply_updates(p1, updates)
    assert int(state.count) == 1  # skipped step does not advance count
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments untouched by the bad step
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(state)
    )

    # recovery: next good step still moves params
    updates, state = fused.update(good, state, p2)
    p3 = optax.apply_updates(p2, updates)
    assert int(state.count) == 2
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3))
    )
    assert moved


def test_build_optimizer_fused_default_and_fallback():
    tx = build_optimizer("adam", lr=1e-3)
    state = tx.init(_tree(0))
    assert state.__class__.__name__ == "FusedAdamState"
    # grad noise forces the optax chain fallback
    tx2 = build_optimizer("adam", lr=1e-3, grad_noise=True)
    state2 = tx2.init(_tree(0))
    assert state2.__class__.__name__ != "FusedAdamState"


def test_fused_adamw_weight_decay():
    params = _tree(0)
    grads_list = [_tree(i + 1) for i in range(3)]
    ref = optax.adamw(1e-2, weight_decay=0.05)
    fused = fused_adam(1e-2, grad_clip=None, weight_decay=0.05)
    p_ref = _run(ref, params, grads_list)
    p_fused = _run(fused, params, grads_list)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fused_adam_with_grad_accumulation():
    """MultiSteps(fused_adam) matches MultiSteps(optax chain): updates
    fire every k-th step with the averaged gradient."""
    params = _tree(0)
    grads_list = [_tree(i + 1) for i in range(6)]

    fused = build_optimizer("adam", lr=1e-2, grad_clip=1.0, accum_grad=3)
    ref_inner = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))
    ref = optax.MultiSteps(ref_inner, every_k_schedule=3)

    p_f = _run(fused, params, grads_list)
    p_r = _run(ref, params, grads_list)
    for a, b in zip(jax.tree_util.tree_leaves(p_r), jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # mid-window steps emit zero updates (params only move at k-th)
    state = fused.init(params)
    u1, state = fused.update(grads_list[0], state, params)
    assert all(np.asarray(x).max() == 0 for x in jax.tree_util.tree_leaves(u1))
