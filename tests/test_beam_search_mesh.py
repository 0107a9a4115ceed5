"""Data-parallel beam search under a device mesh: the batched jittable
beam decodes with the batch sharded over the 'data' axis (8 virtual CPU
devices) and must produce EXACTLY the hypotheses of the unsharded run —
the multi-chip joint-decode capability (SURVEY §2.10 north-star)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from espnet_tpu.models.asr import ASRModel, TransformerDecoder, TransformerEncoder
from espnet_tpu.search.beam_search import BeamSearch
from espnet_tpu.search.scorers import transformer_decoder_scorer


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_beam_search_sharded_matches_unsharded():
    v = 9
    rng = np.random.RandomState(0)
    enc = TransformerEncoder(
        attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1,
        input_layer="linear",
    )
    dec = TransformerDecoder(
        v, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1
    )
    model = ASRModel(vocab_size=v, encoder=enc, decoder=dec, ctc_weight=0.3)
    b, t, d = 8, 12, 6
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    ilens = jnp.asarray(np.full(b, t, np.int32))
    ys = jnp.asarray(rng.randint(1, v - 1, (b, 3)).astype(np.int32))
    variables = model.init(
        jax.random.PRNGKey(0), feats, ilens, ys, jnp.full((b,), 3)
    )

    hs, hlens = model.apply(variables, feats, ilens, method="encode")
    ctc_logp = model.apply(variables, hs, method="ctc_log_softmax")

    bs = BeamSearch(
        full_scorers={
            "decoder": transformer_decoder_scorer(
                model.decoder,
                {"params": variables["params"]["decoder"]},
                0.7,
            )
        },
        vocab_size=v,
        sos=v - 1,
        eos=v - 1,
        beam_size=3,
        ctc_weight=0.3,
    )

    def run(mem, lens, logp):
        return bs(mem, lens, ctc_logp=logp, maxlen=6)

    # unsharded reference
    y_ref, l_ref, s_ref = jax.jit(run)(hs, hlens, ctc_logp)

    # sharded over the data axis
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    hs_s = jax.device_put(hs, shard)
    hlens_s = jax.device_put(hlens, shard)
    logp_s = jax.device_put(ctc_logp, shard)
    with mesh:
        y_sh, l_sh, s_sh = jax.jit(run)(hs_s, hlens_s, logp_s)

    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_sh))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_sh))
    np.testing.assert_allclose(
        np.asarray(s_ref), np.asarray(s_sh), rtol=1e-5, atol=1e-5
    )
