import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.ops.specaug import mask_along_axis, spec_augment


def test_mask_with_mean_value():
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 30, 8).astype(np.float32) + 5.0)
    out = mask_along_axis(rng, x, (5, 10), 2, axis=1, mask_value="mean")
    # masked positions hold the utterance mean, not zero
    changed = np.asarray(out != x).any(axis=-1)
    assert changed.any()
    m = np.asarray(x.mean(axis=(1, 2)))
    o = np.asarray(out)
    xs = np.asarray(x)
    for b in range(2):
        rows = np.where(changed[b])[0]
        np.testing.assert_allclose(o[b, rows[0]], np.full(8, m[b]), rtol=1e-5)


def test_spec_augment_mask_value_plumbs():
    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 40, 10).astype(np.float32))
    out = spec_augment(rng, x, apply_time_warp=False, mask_value="mean")
    assert np.isfinite(np.asarray(out)).all()
