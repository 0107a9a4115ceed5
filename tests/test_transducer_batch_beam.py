"""Batched jittable ALSD beam search vs the host reference implementation
(search/transducer.py transducer_alsd_decode) — hypothesis equivalence on
tiny models (VERDICT r1 item 6 done-criterion)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.asr import RNNEncoder
from espnet_tpu.models.transducer.model import TransducerModel
from espnet_tpu.search.transducer import (
    transducer_alsd_decode,
    transducer_alsd_decode_batch,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = TransducerModel(
        vocab_size=7, encoder=RNNEncoder(elayers=1, eunits=12, eprojs=12),
        dunits=12, joint_dim=12,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(3, 18, 6).astype(np.float32)
    flens = np.array([18, 14, 10], dtype=np.int32)
    ys = rng.randint(1, 6, size=(3, 5)).astype(np.int32)
    ylens = np.array([5, 4, 3], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, flens, ys, ylens)
    hs, hlens = model.apply(variables, feats, flens, method="encode")
    return model, variables, hs, hlens


@pytest.mark.parametrize("beam", [2, 4])
def test_batch_alsd_matches_host(tiny_model, beam):
    model, variables, hs, hlens = tiny_model
    yseq, ylens_out, scores = jax.jit(
        lambda h, hl: transducer_alsd_decode_batch(
            model, variables, h, hl, beam_size=beam
        )
    )(hs, hlens)
    yseq, ylens_out, scores = map(np.asarray, (yseq, ylens_out, scores))
    for i in range(hs.shape[0]):
        want = transducer_alsd_decode(
            model, variables, hs[i : i + 1], int(hlens[i]), beam_size=beam
        )
        want_ids, want_score = want[0]
        got_ids = list(yseq[i, 0, : ylens_out[i, 0]])
        assert got_ids == want_ids, (
            f"utt{i}: batch {got_ids} vs host {want_ids}"
        )
        # normalized scores should agree closely
        got_norm = scores[i, 0] / max(ylens_out[i, 0], 1)
        want_norm = want_score / max(len(want_ids), 1)
        assert abs(got_norm - want_norm) < 1e-3, (got_norm, want_norm)


def test_batch_alsd_is_jittable_and_batch_invariant(tiny_model):
    model, variables, hs, hlens = tiny_model
    f = jax.jit(
        lambda h, hl: transducer_alsd_decode_batch(
            model, variables, h, hl, beam_size=3
        )
    )
    y_all, l_all, s_all = f(hs, hlens)
    # decoding one utterance alone gives the same best hypothesis
    y1, l1, s1 = jax.jit(
        lambda h, hl: transducer_alsd_decode_batch(
            model, variables, h, hl, beam_size=3
        )
    )(hs[1:2], hlens[1:2])
    np.testing.assert_array_equal(
        np.asarray(y_all)[1, 0, : int(l_all[1, 0])],
        np.asarray(y1)[0, 0, : int(l1[0, 0])],
    )
