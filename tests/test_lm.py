"""LM tests: models forward, training CLI end-to-end, perplexity drops,
and LM shallow fusion shifts beam search toward LM-preferred sequences."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_tpu.models.lm import SequentialRNNLM, TransformerLM

V = 8


def test_rnn_lm_step_matches_scan():
    lm = SequentialRNNLM(V, units=16, layers=2)
    toks = jnp.asarray(np.random.RandomState(0).randint(0, V, (2, 5)))
    variables = lm.init(jax.random.PRNGKey(0), toks)
    logits = lm.apply(variables, toks)
    carry = lm.apply(variables, 2, method="init_carry")
    outs = []
    for t in range(5):
        carry, lg = lm.apply(variables, carry, toks[:, t], method="step")
        outs.append(lg)
    step_logits = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(step_logits), rtol=1e-5, atol=1e-5
    )


def test_transformer_lm_score_prefix():
    lm = TransformerLM(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    toks = jnp.asarray(np.random.RandomState(1).randint(0, V, (2, 6)))
    variables = lm.init(jax.random.PRNGKey(0), toks)
    logits = lm.apply(variables, toks)
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    sp = lm.apply(variables, toks, jnp.array([2, 3]), method="score_prefix")
    np.testing.assert_allclose(np.asarray(sp[0]), np.asarray(logp_all[0, 2]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sp[1]), np.asarray(logp_all[1, 3]), rtol=1e-5)


def test_transformer_lm_cached_step_matches_prefix():
    """KV-cached score_step must equal the stateless score_prefix at
    every position (the beam-60 fast path)."""
    lm = TransformerLM(V, attention_dim=16, attention_heads=2,
                       linear_units=16, num_blocks=2)
    rng = np.random.RandomState(2)
    toks = jnp.asarray(rng.randint(0, V, (3, 6)))
    variables = lm.init(jax.random.PRNGKey(0), toks)
    lmax = 6
    cache = lm.apply(variables, 3, lmax, method="init_cache")
    for t in range(lmax):
        pos = jnp.full((3,), t, jnp.int32)
        got, cache = lm.apply(
            variables, cache, toks[:, t], pos, method="score_step"
        )
        want = lm.apply(variables, toks, pos, method="score_prefix")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


@pytest.mark.slow
def test_lm_train_cli_and_perplexity(tmp_path):
    # corpus with strong bigram structure
    rng = np.random.RandomState(0)
    lines = {}
    for i in range(60):
        n = rng.randint(3, 8)
        seq = ["A"]
        for _ in range(n):
            seq.append({"A": "B", "B": "C", "C": "A"}[seq[-1]])
        lines[f"u{i:03d}"] = " ".join(seq)
    from espnet_tpu.data.kaldi_io import write_scp

    write_scp(tmp_path / "text", lines)
    tokens = ["<blank>", "<unk>", "A", "B", "C", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens))

    from espnet_tpu.bin import lm_train

    lm_train.main(
        [
            "--train_data", f"{tmp_path}/text,text,text",
            "--valid_data", f"{tmp_path}/text,text,text",
            "--expdir", str(tmp_path / "exp"),
            "--token_list", str(tmp_path / "tokens.txt"),
            "--lm", "seq_rnn",
            "--lm_conf.units", "16",
            "--lm_conf.layers", "1",
            "--max_epoch", "8",
            "--token_type", "word",
            "--optim_conf.lr", "0.01",
        ]
    )
    from espnet_tpu.bin import lm_calc_perplexity

    ppl = lm_calc_perplexity.main(
        [
            "--data", f"{tmp_path}/text,text,text",
            "--config", str(tmp_path / "exp/config.yaml"),
            "--ckpt", str(tmp_path / "exp/valid.loss.best.ckpt"),
        ]
    )
    # deterministic bigram corpus → ppl far below uniform (6)
    assert ppl < 3.0, ppl


def test_lm_fusion_shifts_beam():
    """A strongly-biased LM must change the beam-search output."""
    from espnet_tpu.models.asr import ASRModel, TransformerDecoder, TransformerEncoder
    from espnet_tpu.search.beam_search import BeamSearch
    from espnet_tpu.search.scorers import rnn_lm_scorer, transformer_decoder_scorer

    rng = np.random.RandomState(0)
    enc = TransformerEncoder(attention_dim=16, attention_heads=2, linear_units=16,
                             num_blocks=1, input_layer="linear")
    dec = TransformerDecoder(V, attention_dim=16, attention_heads=2, linear_units=16, num_blocks=1)
    model = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc_weight=0.3)
    feats = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    ilens = jnp.array([6])
    ys = jnp.asarray(rng.randint(1, V - 1, (1, 3)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, ys, jnp.array([3]))
    hs, hlens = model.apply(variables, feats, ilens, method="encode")
    dec_vars = {"params": variables["params"]["decoder"]}

    lm = SequentialRNNLM(V, units=16, layers=1)
    lm_vars = lm.init(jax.random.PRNGKey(5), jnp.zeros((1, 3), jnp.int32))

    bs0 = BeamSearch(
        {"decoder": transformer_decoder_scorer(dec, dec_vars, 1.0)},
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=6,
    )
    y0, l0, s0 = bs0(hs, hlens, maxlen=3)

    bs1 = BeamSearch(
        {
            "decoder": transformer_decoder_scorer(dec, dec_vars, 1.0),
            "lm": rnn_lm_scorer(lm, lm_vars, 20.0),  # overwhelming weight
        },
        vocab_size=V, sos=V - 1, eos=V - 1, beam_size=6,
    )
    y1, l1, s1 = bs1(hs, hlens, maxlen=3)
    # scores must differ; with overwhelming LM weight the output follows
    # the LM, not the acoustics
    assert float(s0[0, 0]) != float(s1[0, 0])


def test_lm_bptt_training_ppl_parity(tmp_path):
    """BPTT corpus-stream training (reference lm.py:89 BPTTUpdater)
    reaches sentence-level-comparable perplexity on the bigram corpus,
    through the same CLI + perplexity tooling."""
    rng = np.random.RandomState(1)
    lines = {}
    for i in range(60):
        n = rng.randint(3, 8)
        seq = ["A"]
        for _ in range(n):
            seq.append({"A": "B", "B": "C", "C": "A"}[seq[-1]])
        lines[f"u{i:03d}"] = " ".join(seq)
    from espnet_tpu.data.kaldi_io import write_scp

    write_scp(tmp_path / "text", lines)
    tokens = ["<blank>", "<unk>", "A", "B", "C", "<sos/eos>"]
    (tmp_path / "tokens.txt").write_text("\n".join(tokens))

    from espnet_tpu.bin import lm_train, lm_calc_perplexity

    lm_train.main(
        [
            "--train_data", f"{tmp_path}/text,text,text",
            "--valid_data", f"{tmp_path}/text,text,text",
            "--expdir", str(tmp_path / "exp_bptt"),
            "--token_list", str(tmp_path / "tokens.txt"),
            "--lm", "seq_rnn",
            "--lm_conf.units", "16",
            "--lm_conf.layers", "1",
            "--max_epoch", "8",
            "--token_type", "word",
            "--optim_conf.lr", "0.01",
            "--train_mode", "bptt",
            "--bptt_len", "16",
            "--batch_size", "4",
        ]
    )
    ppl = lm_calc_perplexity.main(
        [
            "--data", f"{tmp_path}/text,text,text",
            "--config", str(tmp_path / "exp_bptt/config.yaml"),
            "--ckpt", str(tmp_path / "exp_bptt/valid.loss.best.ckpt"),
        ]
    )
    # same bar as the sentence-level test: far below uniform (6)
    assert ppl < 3.0, ppl


def test_scanned_transformer_lm_cached_step_matches_prefix():
    """ScannedTransformerLM (scan-over-layers: compiled program size
    constant in depth) — cached score_step must equal score_prefix."""
    from espnet_tpu.models.lm import ScannedTransformerLM

    lm = ScannedTransformerLM(V, attention_dim=16, attention_heads=2,
                              linear_units=16, num_blocks=3)
    rng = np.random.RandomState(4)
    toks = jnp.asarray(rng.randint(0, V, (3, 6)))
    variables = lm.init(jax.random.PRNGKey(0), toks)
    # params carry the stacked leading num_blocks axis
    k = variables["params"]["layer"]["norm1"]["scale"]
    assert k.shape[0] == 3
    cache = lm.apply(variables, 3, 6, method="init_cache")
    for t in range(6):
        pos = jnp.full((3,), t, jnp.int32)
        got, cache = lm.apply(
            variables, cache, toks[:, t], pos, method="score_step"
        )
        want = lm.apply(variables, toks, pos, method="score_prefix")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )
