"""KV-cached decoder must give identical scores to the stateless
full-prefix path, and identical beam-search output."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.asr import ASRModel, TransformerDecoder, TransformerEncoder
from espnet_tpu.search.beam_search import BeamSearch
from espnet_tpu.search.scorers import (
    transformer_decoder_cached_scorer,
    transformer_decoder_scorer,
)

V = 6


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                             num_blocks=1, input_layer="linear")
    dec = TransformerDecoder(V, attention_dim=16, attention_heads=2,
                             linear_units=16, num_blocks=2)
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=0.3)
    feats = jnp.asarray(rng.randn(2, 7, 8).astype(np.float32))
    ilens = jnp.array([7, 5])
    ys = jnp.asarray(rng.randint(1, V - 1, (2, 3)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, ys, jnp.array([3, 2]))
    hs, hlens = model.apply(variables, feats, ilens, method="encode")
    dec_vars = {"params": variables["params"]["decoder"]}
    return dec, dec_vars, hs, hlens


@pytest.mark.slow
def test_cached_step_matches_prefix_scoring():
    dec, dec_vars, hs, hlens = _setup()
    n, lmax = 2, 6
    rng = np.random.RandomState(1)
    yseq = jnp.asarray(
        np.concatenate(
            [np.full((n, 1), V - 1), rng.randint(1, V - 1, (n, lmax - 1))], axis=1
        ).astype(np.int32)
    )
    cache = dec.apply(dec_vars, n, lmax, method="init_cache")
    for pos in range(4):
        ref = dec.apply(
            dec_vars, hs, hlens, yseq, jnp.full((n,), pos), method="score_prefix"
        )
        token = yseq[:, pos]
        got, cache = dec.apply(
            dec_vars, cache, hs, hlens, token, jnp.full((n,), pos),
            method="score_step",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        ), pos


def test_cached_beam_search_matches_stateless():
    dec, dec_vars, hs, hlens = _setup(seed=2)
    kw = dict(vocab_size=V, sos=V - 1, eos=V - 1, beam_size=4)
    bs_ref = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 1.0)}, **kw
    )
    bs_fast = BeamSearch(
        {"decoder": transformer_decoder_cached_scorer(dec, dec_vars, 1.0)}, **kw
    )
    y0, l0, s0 = bs_ref(hs, hlens, maxlen=4)
    y1, l1, s1 = bs_fast(hs, hlens, maxlen=4)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4, atol=1e-5)
