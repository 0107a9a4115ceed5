"""depthwise_conv1d custom VJP: outputs and BOTH gradients must match
the default lax.conv_general_dilated autodiff exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.ops.depthwise import depthwise_conv1d


def _ref(x, w):
    d = x.shape[-1]
    k = w.shape[0]
    pad_l = k // 2
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], window_strides=(1,),
        padding=[(pad_l, k - 1 - pad_l)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d,
    )


@pytest.mark.parametrize("k", [1, 3, 7, 31])
@pytest.mark.parametrize("t", [5, 64])
def test_fwd_and_grads_match_default_vjp(k, t):
    if k > 2 * t:  # degenerate: kernel much longer than sequence
        pytest.skip("kernel longer than padded input")
    rng = np.random.RandomState(k * 100 + t)
    b, d = 3, 8
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    w = jnp.asarray(rng.randn(k, d).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, t, d).astype(np.float32))

    y = depthwise_conv1d(x, w)
    np.testing.assert_allclose(y, _ref(x, w), rtol=1e-5, atol=1e-5)

    def loss_ours(x, w):
        return jnp.sum(depthwise_conv1d(x, w) * cot)

    def loss_ref(x, w):
        return jnp.sum(_ref(x, w) * cot)

    gx, gw = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw, rw, rtol=1e-4, atol=1e-4)


def test_under_jit_and_vmap():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    y1 = jax.jit(depthwise_conv1d)(x, w)
    np.testing.assert_allclose(y1, _ref(x, w), rtol=1e-5, atol=1e-5)
    g = jax.jit(jax.grad(lambda x: jnp.sum(depthwise_conv1d(x, w))))(x)
    assert g.shape == x.shape


def test_conv_module_grads_unchanged():
    """ConformerConvModule end-to-end: grads with the custom-VJP conv
    equal grads computed via the plain lax conv formulation."""
    from espnet_tpu.layers.convolution import ConformerConvModule

    rng = np.random.RandomState(1)
    b, t, d = 2, 12, 8
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    mod = ConformerConvModule(kernel_size=5)
    variables = mod.init(jax.random.PRNGKey(0), x, mask)

    def loss(v):
        return jnp.sum(mod.apply(v, x, mask) ** 2)

    g = jax.grad(loss)(variables)

    # finite-difference check on one kernel tap
    eps = 1e-3
    flat = variables["params"]["dw_kernel"]
    vp = jax.tree_util.tree_map(lambda x: x, variables)
    vp["params"]["dw_kernel"] = flat.at[2, 0, 3].add(eps)
    vm = jax.tree_util.tree_map(lambda x: x, variables)
    vm["params"]["dw_kernel"] = flat.at[2, 0, 3].add(-eps)
    fd = (loss(vp) - loss(vm)) / (2 * eps)
    np.testing.assert_allclose(
        g["params"]["dw_kernel"][2, 0, 3], fd, rtol=2e-2
    )


@pytest.mark.parametrize("pad_left", [0, 2, 4])  # causal, mid, centered+
def test_pad_left_variants(pad_left):
    rng = np.random.RandomState(pad_left)
    b, t, d, k = 2, 10, 4, 5
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    w = jnp.asarray(rng.randn(k, d).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, t, d).astype(np.float32))

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w[:, None, :], window_strides=(1,),
            padding=[(pad_left, k - 1 - pad_left)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d,
        )

    y = depthwise_conv1d(x, w, pad_left)
    np.testing.assert_allclose(y, ref(x, w), rtol=1e-5, atol=1e-5)
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(depthwise_conv1d(x, w, pad_left) * cot),
        argnums=(0, 1),
    )(x, w)
    rx, rw = jax.grad(
        lambda x, w: jnp.sum(ref(x, w) * cot), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(gx, rx, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw, rw, rtol=1e-4, atol=1e-4)
