"""Joint enhancement+ASR model (reference espnet_joint_model.py:30).

Tiny-model forward/backward on CPU plus an exact check of the
PIT-permutation realignment (the separated stream fed to the ASR for
text_ref i must be the one PIT matched to speech_ref i)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from espnet_tpu.models.asr import ASRModel, RNNEncoder
from espnet_tpu.models.asr.frontend import DefaultFrontend
from espnet_tpu.models.enh.joint import EnhASRModel
from espnet_tpu.models.enh.models import TFMaskingNet


def _tiny_asr(vocab=11):
    return ASRModel(
        vocab_size=vocab,
        encoder=RNNEncoder(elayers=1, eunits=8, eprojs=8),
        decoder=None,
        frontend=DefaultFrontend(n_fft=64, hop_length=32, n_mels=8),
        ctc_weight=1.0,
    )


class _SwapSeparator(nn.Module):
    """Returns the two reference signals swapped — PIT must pick the
    swap permutation and the joint model must un-swap before ASR."""

    refs: tuple

    @nn.compact
    def __call__(self, speech_mix, lengths):
        r0 = jnp.asarray(self.refs[0])
        r1 = jnp.asarray(self.refs[1])
        return [r1, r0], lengths


@pytest.mark.slow
def test_enh_asr_forward_backward():
    rng = np.random.RandomState(0)
    b, n, u, vocab = 2, 800, 5, 11
    mix = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1)
    refs = jnp.asarray(rng.randn(b, 2, n).astype(np.float32) * 0.1)
    slens = jnp.asarray(np.array([n, n - 100], np.int32))
    text = jnp.asarray(rng.randint(1, vocab - 1, size=(b, 2, u)).astype(np.int32))
    tlens = jnp.asarray(np.full((b, 2), u, np.int32))

    model = EnhASRModel(
        separator=TFMaskingNet(n_spk=2, n_fft=64, hop_length=32, units=8, layers=1),
        asr=_tiny_asr(vocab),
        n_spk=2,
        enh_weight=0.5,
    )
    variables = model.init(jax.random.PRNGKey(0), mix, slens, refs, text, tlens)
    loss, stats = model.apply(variables, mix, slens, refs, text, tlens)
    assert np.isfinite(float(loss))
    assert {"loss_enh", "loss_asr", "si_snr"} <= set(stats)

    g = jax.grad(
        lambda v: model.apply(v, mix, slens, refs, text, tlens)[0]
    )(variables)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert any(nm > 0 for nm in norms)


def test_enh_asr_perm_realignment():
    """With a separator that outputs the refs swapped, the PIT winner is
    the swap and the ASR must consume streams in REF order."""
    rng = np.random.RandomState(1)
    b, n, u, vocab = 2, 800, 4, 11
    refs_np = rng.randn(b, 2, n).astype(np.float32) * 0.1
    mix = jnp.asarray(refs_np.sum(1))
    refs = jnp.asarray(refs_np)
    slens = jnp.asarray(np.full(b, n, np.int32))
    text = jnp.asarray(rng.randint(1, vocab - 1, size=(b, 2, u)).astype(np.int32))
    tlens = jnp.asarray(np.full((b, 2), u, np.int32))

    captured = {}

    class _CaptureASR(nn.Module):
        @nn.compact
        def __call__(self, speech, lengths, ys, ylens, deterministic=True):
            # a param so init works
            _ = self.param("w", nn.initializers.zeros, (1,))
            captured["speech"] = speech
            return jnp.sum(speech * 0.0), {"loss": jnp.asarray(0.0)}

    model = EnhASRModel(
        separator=_SwapSeparator(refs=(refs_np[:, 0], refs_np[:, 1])),
        asr=_CaptureASR(),
        n_spk=2,
        enh_weight=0.5,
    )
    variables = model.init(jax.random.PRNGKey(0), mix, slens, refs, text, tlens)
    model.apply(variables, mix, slens, refs, text, tlens)
    got = np.asarray(captured["speech"]).reshape(b, 2, n)
    np.testing.assert_allclose(got, refs_np, atol=1e-6)
