import jax.numpy as jnp
import numpy as np

from espnet_tpu.utils.masks import (
    causal_attn_mask,
    make_non_pad_mask,
    make_pad_mask,
    subsequent_mask,
)


def test_make_pad_mask():
    m = make_pad_mask(jnp.array([3, 1, 4]), 4)
    expect = np.array(
        [
            [False, False, False, True],
            [False, True, True, True],
            [False, False, False, False],
        ]
    )
    np.testing.assert_array_equal(np.asarray(m), expect)
    np.testing.assert_array_equal(
        np.asarray(make_non_pad_mask(jnp.array([3, 1, 4]), 4)), ~expect
    )


def test_subsequent_mask():
    m = np.asarray(subsequent_mask(3))
    np.testing.assert_array_equal(
        m, np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=bool)
    )


def test_causal_attn_mask():
    m = np.asarray(causal_attn_mask(jnp.array([2, 3]), 3))
    assert m.shape == (2, 3, 3)
    assert m[0, 2, 2] == False  # padded key position
    assert m[1, 2, 2] == True
    assert m[0, 0, 1] == False  # future position
