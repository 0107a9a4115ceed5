"""Params-as-args decode path (round-5 finding): scorer weights must be
threadable through the jitted beam search as ARGUMENTS, not captured
constants — captured weight constants serialize into the compile
payload (compile-time bloat on any TPU; HTTP 413 under a remote-compile
tunnel at d>=512 scale). Reference analog: the torch BeamSearch holds
scorers as modules (beam_search.py:36) — tracing/compilation makes the
distinction matter only in the XLA world, so this is a TPU-native
design requirement with no reference counterpart.

Certifies:
  1. scorer_params-threaded search == default (stored-params) search,
  2. the traced search jaxpr carries NO weight-sized constants,
  3. the Speech2Text product path exposes the same property.
"""
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.search.beam_search import BeamSearch
from espnet_tpu.search.scorers import (
    transformer_decoder_cached_scorer,
    transformer_decoder_scorer,
)
from tests.test_beam_search import V, _setup


def _const_nbytes(closed_jaxpr):
    return sum(
        np.asarray(c).nbytes
        for c in closed_jaxpr.consts
        if hasattr(c, "nbytes") or isinstance(c, (np.ndarray, jnp.ndarray))
    )


def _param_nbytes(tree):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree))


def test_params_as_args_matches_default():
    _, dec, dec_vars, hs, hlens, ctc_logp = _setup(seed=1, ctc_weight=0.5)
    bs = BeamSearch(
        {"decoder": transformer_decoder_cached_scorer(dec, dec_vars, 0.7)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=4, ctc_weight=0.3,
    )
    # default path: params resolved from FullScorer.params
    y0, l0, s0 = bs(hs, hlens, ctc_logp=ctc_logp, maxlen=4, minlen=1)

    # threaded path: same params as a jit ARGUMENT
    run = jax.jit(
        lambda sp, m, ml, cl: bs(
            m, ml, ctc_logp=cl, maxlen=4, minlen=1,
            scorer_params=sp,
        )
    )
    y1, l1, s1 = run({"decoder": dec_vars}, hs, hlens, ctc_logp)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


def test_no_weight_constants_in_traced_search():
    # a decoder big enough that a baked-in copy is unambiguous
    from espnet_tpu.models.asr import TransformerDecoder

    dec = TransformerDecoder(
        V, attention_dim=64, attention_heads=4, linear_units=256, num_blocks=2
    )
    rng = np.random.RandomState(0)
    hs = jnp.asarray(rng.randn(1, 6, 64).astype(np.float32))
    hlens = jnp.array([6])
    dec_vars = dec.init(
        jax.random.PRNGKey(0), hs, hlens, jnp.ones((1, 3), jnp.int32), None
    )
    pbytes = _param_nbytes(dec_vars)
    assert pbytes > 100_000  # sanity: weights are big

    bs = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 1.0)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=4,
    )

    def run(sp, m, ml):
        return bs(m, ml, maxlen=4, minlen=1, scorer_params=sp)

    jaxpr = jax.make_jaxpr(run)({"decoder": dec_vars}, hs, hlens)
    cbytes = _const_nbytes(jaxpr)
    # weights threaded as args -> only scalar/iota-scale consts remain
    assert cbytes < pbytes / 10, (cbytes, pbytes)

    # control: the default path (no scorer_params) bakes them in
    jaxpr0 = jax.make_jaxpr(lambda m, ml: bs(m, ml, maxlen=4, minlen=1))(
        hs, hlens
    )
    assert _const_nbytes(jaxpr0) >= pbytes


def test_speech2text_threads_params(tmp_path):
    """Product path: Speech2Text._search takes the scorer params as its
    first argument and its trace holds no weight-sized constants."""
    from espnet_tpu.bin.asr_inference import Speech2Text
    from espnet_tpu.models.asr import ASRModel, TransformerDecoder, TransformerEncoder

    rng = np.random.RandomState(2)
    enc = TransformerEncoder(
        attention_dim=32, attention_heads=2, linear_units=64, num_blocks=1,
        input_layer="linear",
    )
    dec = TransformerDecoder(
        V, attention_dim=32, attention_heads=2, linear_units=64, num_blocks=1
    )
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=0.3)
    feats = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    ilens = jnp.array([6])
    ys = jnp.asarray(rng.randint(1, V - 1, size=(1, 3)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, ys, jnp.array([3]))
    token_list = ["<blank>", "a", "b", "<space>", "<sos/eos>"]

    s2t = Speech2Text(model, variables, token_list, beam_size=3, ctc_weight=0.3)
    assert "decoder" in s2t._scorer_params
    results = s2t(np.asarray(feats), np.asarray(ilens))
    assert len(results) == 1 and len(results[0]) >= 1
    text, tokens, ids, score = results[0][0]
    assert isinstance(text, str) and np.isfinite(score)

    # the jitted search trace must not bake the decoder weights in
    hs, hlens = s2t._encode(variables, feats, ilens)
    ctc_logp = s2t._ctc_logp(variables, hs)
    jaxpr = jax.make_jaxpr(
        lambda sp, m, ml, cl: s2t.beam_search(
            m, ml, ctc_logp=cl, maxlen=4, minlen=0, return_finished=True,
            scorer_params=sp,
        )
    )(s2t._scorer_params, hs, hlens, ctc_logp)
    assert _const_nbytes(jaxpr) < _param_nbytes(s2t._scorer_params) / 10
