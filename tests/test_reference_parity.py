"""Weight-grafted numerical parity vs the reference implementation.

SURVEY §4.3 acceptance bar: graft identical weights into the reference's
torch modules (imported from /root/reference, CPU) and into our flax/JAX
modules, feed identical inputs, and assert allclose. Unlike the
self-consistency suites elsewhere in tests/, these catch a *shared*
misreading of the reference's semantics.

Covered (reference citations):
- MultiHeadedAttention               transformer/attention.py:16
- RelPositionMultiHeadedAttention    transformer/attention.py:117 (legacy
  rel-shift: see note below)
- Conformer EncoderLayer             conformer/encoder_layer.py:17
- Conv2dSubsampling                  transformer/subsampling.py:14
- LabelSmoothingLoss                 transformer/label_smoothing_loss.py:13
- CTCPrefixScore / CTCPrefixScoreTH  ctc_prefix_score.py:224,12
- Transformer Encoder (full stack)   transformer/encoder.py:48

Legacy rel-shift note: this reference snapshot's rel-pos attention uses
the *legacy* Transformer-XL shift — pos_emb has length T (not 2T-1) and
the pad/reshape shift is only well-defined for key<=query (j<=i); for
j>i it reads spilled values from the next query row (later espnet
renamed it LegacyRelPositionMultiHeadedAttention and added the proper
2T-1 version, which is what we implement). Equivalence therefore holds
exactly on the causal region: with a causal mask and our pos_emb rows
0..T-1 set to the reference's legacy table (distance d stored at row
T-1-d on both sides for d>=0), outputs must match to float tolerance.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

@pytest.fixture(autouse=True)
def _x64():
    # x64 for tight allclose tolerances vs torch double — scoped per
    # test, NOT at module import: pytest imports every module during
    # collection, and a global flip here would retype other suites'
    # lax.while_loop carries (observed: beam-search TypeError)
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


torch = pytest.importorskip("torch")


def _install_reference():
    """Make /root/reference importable: shim the two pruned deps."""
    if "pkg_resources" not in sys.modules:
        fake = types.ModuleType("pkg_resources")

        def get_distribution(name):
            raise Exception("not installed")

        fake.get_distribution = get_distribution
        sys.modules["pkg_resources"] = fake
    if "editdistance" not in sys.modules:
        ed = types.ModuleType("editdistance")
        ed.eval = lambda a, b: 0  # only imported, not used in these paths
        sys.modules["editdistance"] = ed
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


_install_reference()
pytest.importorskip("espnet.nets.ctc_prefix_score")


def _lin(lin):
    """torch nn.Linear → flax Dense params."""
    g = {"kernel": jnp.asarray(lin.weight.detach().numpy().T)}
    if lin.bias is not None:
        g["bias"] = jnp.asarray(lin.bias.detach().numpy())
    return g


def _ln(ln):
    """torch nn.LayerNorm → flax LayerNorm params."""
    return {
        "scale": jnp.asarray(ln.weight.detach().numpy()),
        "bias": jnp.asarray(ln.bias.detach().numpy()),
    }


def _ff(ff):
    """reference PositionwiseFeedForward (w_1, w_2) → flax params."""
    return {"Dense_0": _lin(ff.w_1), "Dense_1": _lin(ff.w_2)}


def _mha(att):
    p = {
        "linear_q": _lin(att.linear_q),
        "linear_k": _lin(att.linear_k),
        "linear_v": _lin(att.linear_v),
        "linear_out": _lin(att.linear_out),
    }
    if hasattr(att, "linear_pos"):
        p["linear_pos"] = _lin(att.linear_pos)
        p["pos_bias_u"] = jnp.asarray(att.pos_bias_u.detach().numpy())
        p["pos_bias_v"] = jnp.asarray(att.pos_bias_v.detach().numpy())
    return p


def _t(x):
    return torch.tensor(np.asarray(x))


# ---------------------------------------------------------------- attention


def test_mhsa_parity():
    from espnet.nets.pytorch_backend.transformer.attention import (
        MultiHeadedAttention as RefMHA,
    )

    from espnet_tpu.layers.attention import MultiHeadedAttention

    b, t, h, d = 2, 7, 4, 32
    torch.manual_seed(0)
    ref = RefMHA(h, d, 0.0).double().eval()
    mine = MultiHeadedAttention(h, d, 0.0, dtype=jnp.float64)
    x = np.random.RandomState(1).randn(b, t, d)
    mask = np.ones((b, 1, t), bool)
    mask[1, 0, 5:] = False

    params = _mha(ref)
    out_mine = mine.apply(
        {"params": params},
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), jnp.asarray(mask),
    )
    with torch.no_grad():
        out_ref = ref(_t(x), _t(x), _t(x), _t(mask))
    np.testing.assert_allclose(
        np.asarray(out_mine), out_ref.numpy(), atol=1e-6
    )


def _legacy_pos_pair(ref_pe, x_t, t, d):
    """(legacy pos_emb for the reference, matching 2T-1 pos_emb for us)."""
    with torch.no_grad():
        _, pos_legacy = ref_pe(x_t)  # (1, T, D)
    pos_mine = np.concatenate(
        [pos_legacy.numpy()[0], np.zeros((t - 1, d))], axis=0
    )[None]
    return pos_legacy, jnp.asarray(pos_mine)


def test_relpos_mhsa_parity_causal():
    from espnet.nets.pytorch_backend.transformer.attention import (
        RelPositionMultiHeadedAttention as RefRel,
    )
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding as RefRelPE,
    )

    from espnet_tpu.layers.attention import RelPositionMultiHeadedAttention

    b, t, h, d = 2, 9, 4, 32
    torch.manual_seed(0)
    ref = RefRel(h, d, 0.0).double().eval()
    ref_pe = RefRelPE(d, 0.0).double().eval()
    x = np.random.RandomState(1).randn(b, t, d)
    causal = np.tril(np.ones((t, t), bool))[None].repeat(b, 0)
    pos_legacy, pos_mine = _legacy_pos_pair(ref_pe, _t(x), t, d)

    mine = RelPositionMultiHeadedAttention(h, d, 0.0, dtype=jnp.float64)
    out_mine = mine.apply(
        {"params": _mha(ref)},
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
        pos_mine, jnp.asarray(causal),
    )
    with torch.no_grad():
        out_ref = ref(_t(x), _t(x), _t(x), pos_legacy, _t(causal))
    np.testing.assert_allclose(
        np.asarray(out_mine), out_ref.numpy(), atol=1e-6
    )


# ------------------------------------------------------------ conformer block


def _conv_module(cm):
    """reference ConvolutionModule → our ConformerConvModule params
    (+ batch_stats). torch Conv1d weight (out, in/groups, k) → (k, in, out)."""

    def w(conv):
        return jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0))

    params = {
        "pw1_kernel": w(cm.pointwise_conv1),
        "pw1_bias": jnp.asarray(cm.pointwise_conv1.bias.detach().numpy()),
        "dw_kernel": w(cm.depthwise_conv),
        "dw_bias": jnp.asarray(cm.depthwise_conv.bias.detach().numpy()),
        "pw2_kernel": w(cm.pointwise_conv2),
        "pw2_bias": jnp.asarray(cm.pointwise_conv2.bias.detach().numpy()),
        "BatchNorm_0": {
            "scale": jnp.asarray(cm.norm.weight.detach().numpy()),
            "bias": jnp.asarray(cm.norm.bias.detach().numpy()),
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": jnp.asarray(cm.norm.running_mean.detach().numpy()),
            "var": jnp.asarray(cm.norm.running_var.detach().numpy()),
        }
    }
    return params, stats


def test_conv_module_parity():
    from espnet.nets.pytorch_backend.conformer.convolution import (
        ConvolutionModule as RefConv,
    )
    from espnet.nets.pytorch_backend.conformer.swish import Swish

    from espnet_tpu.layers.convolution import ConformerConvModule

    b, t, d, k = 2, 12, 16, 5
    torch.manual_seed(0)
    ref = RefConv(d, k, activation=Swish()).double().eval()
    # give the (running) batch-norm stats non-trivial values
    ref.norm.running_mean.normal_(0.1, 0.2)
    ref.norm.running_var.uniform_(0.5, 2.0)
    x = np.random.RandomState(2).randn(b, t, d)

    params, stats = _conv_module(ref)
    mine = ConformerConvModule(
        kernel_size=k, use_batch_norm=True, dtype=jnp.float64
    )
    out_mine = mine.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    with torch.no_grad():
        out_ref = ref(_t(x))
    np.testing.assert_allclose(
        np.asarray(out_mine), out_ref.numpy(), atol=1e-6
    )


def test_conformer_encoder_layer_parity_causal():
    """Full conformer block (macaron FF + rel-pos MHSA + conv module with
    BatchNorm + FF + final norm) under a causal mask (see legacy note)."""
    from espnet.nets.pytorch_backend.conformer.convolution import (
        ConvolutionModule as RefConv,
    )
    from espnet.nets.pytorch_backend.conformer.encoder_layer import (
        EncoderLayer as RefLayer,
    )
    from espnet.nets.pytorch_backend.transformer.attention import (
        RelPositionMultiHeadedAttention as RefRel,
    )
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding as RefRelPE,
    )
    from espnet.nets.pytorch_backend.transformer.positionwise_feed_forward import (
        PositionwiseFeedForward as RefFF,
    )
    from espnet.nets.pytorch_backend.conformer.swish import Swish

    from espnet_tpu.models.asr.conformer_encoder import ConformerEncoderLayer

    b, t, h, d, ff, k = 2, 12, 4, 32, 64, 5
    torch.manual_seed(0)
    ref = RefLayer(
        d,
        RefRel(h, d, 0.0),
        RefFF(d, ff, 0.0, Swish()),
        RefFF(d, ff, 0.0, Swish()),
        RefConv(d, k, activation=Swish()),
        dropout_rate=0.0,
    ).double().eval()
    ref.conv_module.norm.running_mean.normal_(0.1, 0.2)
    ref.conv_module.norm.running_var.uniform_(0.5, 2.0)
    ref_pe = RefRelPE(d, 0.0).double().eval()

    x = np.random.RandomState(3).randn(b, t, d)
    causal = np.tril(np.ones((t, t), bool))[None].repeat(b, 0)
    pos_legacy, pos_mine = _legacy_pos_pair(ref_pe, _t(x), t, d)

    conv_params, conv_stats = _conv_module(ref.conv_module)
    params = {
        "LayerNorm_0": _ln(ref.norm_ff_macaron),
        "PositionwiseFeedForward_0": _ff(ref.feed_forward_macaron),
        "LayerNorm_1": _ln(ref.norm_mha),
        "RelPositionMultiHeadedAttention_0": _mha(ref.self_attn),
        "LayerNorm_2": _ln(ref.norm_conv),
        "ConformerConvModule_0": conv_params,
        "LayerNorm_3": _ln(ref.norm_ff),
        "PositionwiseFeedForward_1": _ff(ref.feed_forward),
        "LayerNorm_4": _ln(ref.norm_final),
    }
    mine = ConformerEncoderLayer(
        attention_dim=d, attention_heads=h, linear_units=ff, cnn_kernel=k,
        dropout_rate=0.0, conv_use_batch_norm=True, dtype=jnp.float64,
    )
    out_mine = mine.apply(
        {"params": params, "batch_stats": {"ConformerConvModule_0": conv_stats}},
        jnp.asarray(x), pos_mine, jnp.asarray(causal), None,
    )
    with torch.no_grad():
        # input was a (x, pos_emb) tuple → returns ((x, pos_emb), mask)
        (out_ref, _), _ = ref((_t(x), pos_legacy), _t(causal))
    # ~2e-6 drift accumulates across the five stacked sub-modules
    np.testing.assert_allclose(
        np.asarray(out_mine), out_ref.numpy(), atol=1e-5
    )


# ------------------------------------------------------------- subsampling


def test_conv2d_subsampling_parity():
    from espnet.nets.pytorch_backend.transformer.subsampling import (
        Conv2dSubsampling as RefSub,
    )

    from espnet_tpu.layers.subsampling import Conv2dSubsampling

    b, t, idim, odim = 2, 37, 40, 32
    torch.manual_seed(0)
    ref = RefSub(idim, odim, 0.0, pos_enc=torch.nn.Identity()).double().eval()
    x = np.random.RandomState(4).randn(b, t, idim)

    conv0, conv1 = ref.conv[0], ref.conv[2]
    lin = ref.out[0]
    # torch flattens (C, F') channel-major; ours flattens (F', C)
    f_out = ((idim - 1) // 2 - 1) // 2
    w = lin.weight.detach().numpy()  # (odim, C*F') with index c*F'+f
    perm = np.array(
        [c * f_out + f for f in range(f_out) for c in range(odim)]
    )
    params = {
        "Conv_0": {
            "kernel": jnp.asarray(
                conv0.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(conv0.bias.detach().numpy()),
        },
        "Conv_1": {
            "kernel": jnp.asarray(
                conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(conv1.bias.detach().numpy()),
        },
        "Dense_0": {
            "kernel": jnp.asarray(w[:, perm].T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        },
    }
    mine = Conv2dSubsampling(odim=odim, factor=4, dtype=jnp.float64)
    ilens = jnp.asarray(np.full(b, t, np.int32))
    out_mine, olens = mine.apply({"params": params}, jnp.asarray(x), ilens)
    with torch.no_grad():
        out_ref, _ = ref(_t(x), None)
    np.testing.assert_allclose(
        np.asarray(out_mine), out_ref.numpy(), atol=1e-6
    )
    assert int(olens[0]) == out_ref.shape[1]


# ---------------------------------------------------------- label smoothing


def test_label_smoothing_parity():
    from espnet.nets.pytorch_backend.transformer.label_smoothing_loss import (
        LabelSmoothingLoss,
    )

    from espnet_tpu.losses.label_smoothing import label_smoothing_loss

    b, l, v = 3, 7, 11
    rng = np.random.RandomState(5)
    logits = rng.randn(b, l, v)
    targets = rng.randint(0, v, (b, l)).astype(np.int64)
    targets[1, 5:] = -1  # padding
    targets[2, 3:] = -1

    ref = LabelSmoothingLoss(v, -1, smoothing=0.1, normalize_length=True)
    with torch.no_grad():
        loss_ref = ref(_t(logits), _t(targets))
    loss_mine = label_smoothing_loss(
        jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1,
        ignore_id=-1, normalize_length=True,
    )
    np.testing.assert_allclose(
        float(loss_mine), float(loss_ref), rtol=1e-6
    )


# ------------------------------------------------------- CTC prefix scoring


def test_ctc_prefix_score_th_parity():
    """Step-wise comparison vs CTCPrefixScoreTH (full-vocab scoring):
    advance a beam of prefixes for several steps; the incremental scores
    (log_psi - s_prev) must match ours at every step."""
    from espnet.nets.ctc_prefix_score import CTCPrefixScoreTH

    from espnet_tpu.search.ctc_prefix import (
        ctc_prefix_init,
        ctc_prefix_score,
        ctc_prefix_select,
    )

    t_len, v, w = 11, 6, 3  # frames, vocab (0=blank, 5=eos), beam
    blank, eos = 0, v - 1
    rng = np.random.RandomState(6)
    logits = rng.randn(1, t_len, v) * 2.0
    logp = torch.log_softmax(_t(logits), dim=-1).double()

    ref = CTCPrefixScoreTH(logp.clone(), torch.tensor([t_len]), blank, eos)

    logp_np = np.asarray(logp)
    tiled = jnp.asarray(np.repeat(logp_np, w, axis=0))  # (W, T, V)
    tlens = jnp.asarray(np.full(w, t_len, np.int32))
    state_mine = ctc_prefix_init(tiled, tlens, blank=blank)

    # beam of prefixes, extended with fixed tokens each step so both
    # implementations follow the same hypotheses
    ys = [[eos], [eos], [eos]]  # sos == eos convention
    state_ref = None
    steps = [[1, 2, 3], [2, 2, 4], [3, 1, 1], [1, 3, 2]]
    cand = jnp.asarray(np.tile(np.arange(v), (w, 1)))  # score full vocab
    for chosen in steps:
        scores_ref, state_ref = ref(ys, state_ref, None, None)
        scores_mine, cand_state = ctc_prefix_score(
            state_mine, tiled, tlens, cand, eos=eos, blank=blank
        )
        np.testing.assert_allclose(
            np.asarray(scores_mine),
            scores_ref.numpy(),
            atol=1e-5,
        )
        # advance: hypothesis i extends with chosen[i]
        best_ids = torch.tensor(
            [[i * v + c for i, c in enumerate(chosen)]]
        )  # (B=1, W) flat ids in (hyp, vocab) space
        state_ref = ref.index_select_state(state_ref, best_ids)
        hyp_idx = jnp.asarray(np.arange(w, dtype=np.int32))
        cand_idx = jnp.asarray(np.array(chosen, dtype=np.int32))
        state_mine = ctc_prefix_select(cand_state, hyp_idx, cand_idx)
        for i, c in enumerate(chosen):
            ys[i] = ys[i] + [c]


def test_ctc_prefix_score_single_parity():
    """Our scorer vs the reference's single-hypothesis numpy scorer."""
    from espnet.nets.ctc_prefix_score import CTCPrefixScore

    from espnet_tpu.search.ctc_prefix import (
        ctc_prefix_init,
        ctc_prefix_score,
        ctc_prefix_select,
    )

    t_len, v = 9, 5
    blank, eos = 0, v - 1
    rng = np.random.RandomState(7)
    logits = rng.randn(t_len, v) * 2.0
    logp = torch.log_softmax(_t(logits), dim=-1).double().numpy()

    ref = CTCPrefixScore(logp, blank, eos, np)
    r_prev = ref.initial_state()

    logp_j = jnp.asarray(logp)[None]
    state = ctc_prefix_init(logp_j, jnp.asarray([t_len]), blank=blank)
    cand = jnp.asarray(np.arange(v)[None])

    y = [eos]
    for tok in [1, 2, 2, 3]:
        cs = np.array([c for c in range(v)])
        scores_ref, r_new = ref(y, cs, r_prev)
        scores_mine, cand_state = ctc_prefix_score(
            state, logp_j, jnp.asarray([t_len]), cand, eos=eos, blank=blank
        )
        # reference returns TOTAL log psi (float32); ours incremental.
        prev = float(state.score[0])
        np.testing.assert_allclose(
            np.asarray(scores_mine)[0] + prev, scores_ref, atol=1e-4
        )
        r_prev = r_new[tok]  # label axis is first (:312)
        state = ctc_prefix_select(
            cand_state, jnp.asarray([0]), jnp.asarray([tok])
        )
        y.append(tok)


# ---------------------------------------------------------------- beam search
@pytest.mark.parametrize("seed", range(8))
def test_beam_search_hypothesis_equality(seed):
    """1-best equality vs the reference BeamSearch
    (espnet/nets/beam_search.py:36): both searches drive the SAME
    deterministic scorer table, so the decoded 1-best sequence and its
    accumulated score must agree exactly (SURVEY §7.5 — search semantics
    isolated from any model).

    Lower ranks legitimately differ BY DESIGN on two points:
    1. the reference is a single beam where eos-ended hypotheses occupy
       beam slots at the step they end (an ending outside the global
       top-W is lost — observed: it prunes a -3.03 ending while keeping
       a -7.22 one); our alive/finished double-beam keeps the best W
       endings across all steps.
    2. at maxlen the reference appends eos WITHOUT charging its
       log-prob (beam_search.py post_process "add eos in the final
       loop"); ours charges the eos score on every ending, so
       reference maxlen-forced hypotheses rank optimistically high."""
    import torch

    from espnet.nets.beam_search import BeamSearch as RefBeamSearch
    from espnet.nets.scorer_interface import ScorerInterface

    from espnet_tpu.search.beam_search import BeamSearch, FullScorer

    V, T, BEAM, MAXLEN = 7, 12, 4, 8
    sos = eos = V - 1
    # deterministic score table: logp(next | len(prefix), last_token)
    table = np.log(
        np.random.RandomState(100 + seed).dirichlet(
            np.ones(V), size=(MAXLEN + 2, V)
        )
    ).astype(np.float32)
    # token 0 is the CTC blank: our attention beam masks it always (a
    # trained decoder never emits it); keep the table consistent
    table[:, :, 0] = -30.0

    class TableScorer(ScorerInterface, torch.nn.Module):
        def init_state(self, x):
            return None

        def score(self, y, state, x):
            lp = table[len(y) - 1, int(y[-1])]
            return torch.from_numpy(lp), None

    ref = RefBeamSearch(
        scorers={"decoder": TableScorer()},
        weights={"decoder": 1.0},
        beam_size=BEAM,
        vocab_size=V,
        sos=sos,
        eos=eos,
        pre_beam_score_key="full",
    )
    x = torch.zeros(T, 4)
    with torch.no_grad():
        ref_hyps = ref.forward(x, maxlenratio=MAXLEN / T + 1e-9)
    ref_best = ([int(t) for t in ref_hyps[0].yseq], float(ref_hyps[0].score))

    tbl = jnp.asarray(table)

    def score_fn(state, yseq, pos):
        last = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]
        lp = tbl[jnp.minimum(state, MAXLEN + 1)][jnp.arange(last.shape[0]), last]
        return lp, state + 1

    ours = BeamSearch(
        {
            "decoder": FullScorer(
                weight=1.0,
                init=lambda mem, lens, l: jnp.zeros(mem.shape[0], jnp.int32),
                score=score_fn,
            )
        },
        vocab_size=V, sos=sos, eos=eos, beam_size=BEAM,
        # the reference expands exactly top-BEAM tokens per hypothesis
        pre_beam_size=BEAM,
    )
    mem = jnp.zeros((1, T, 4))
    lens = jnp.asarray([T])
    yseq, ylen, scores = ours(mem, lens, maxlen=MAXLEN, minlen=0)
    got_best = (
        [int(v) for v in np.asarray(yseq[0, 0])[: int(ylen[0, 0])]],
        float(scores[0, 0]),
    )
    assert got_best[0] == ref_best[0], (got_best, ref_best)
    np.testing.assert_allclose(got_best[1], ref_best[1], rtol=1e-4)


# ---------------------------------------------------------------- tacotron2
def test_tacotron2_decoder_step_parity():
    """Weight-grafted teacher-forced Tacotron2 decoder parity
    (tacotron2/decoder.py:269 Decoder.forward with AttLoc): mel frames,
    stop logits and attention weights must match with dropout/zoneout
    disabled and no postnet."""
    import torch

    from espnet.nets.pytorch_backend.rnn.attentions import AttLoc
    from espnet.nets.pytorch_backend.tacotron2.decoder import (
        Decoder as RefDecoder,
    )

    from espnet_tpu.models.tts.tacotron2 import Tacotron2DecoderStep

    b, t_enc, eproj, odim = 2, 9, 12, 5
    dunits, dlayers, prenet_units = 16, 2, 8
    att_dim, aconv_chans, aconv_filts = 10, 4, 3
    L = 4

    torch.manual_seed(0)
    att = AttLoc(eproj, dunits, att_dim, aconv_chans, aconv_filts).double()
    ref = RefDecoder(
        idim=eproj, odim=odim, att=att,
        dlayers=dlayers, dunits=dunits,
        prenet_layers=2, prenet_units=prenet_units,
        postnet_layers=0,
        use_batch_norm=False, use_concate=True,
        dropout_rate=0.0, zoneout_rate=0.0, reduction_factor=1,
    ).double().eval()

    rng = np.random.RandomState(0)
    hs = rng.randn(b, t_enc, eproj)
    hlens = np.array([t_enc, t_enc - 2])
    ys = rng.randn(b, L, odim)
    with torch.no_grad():
        after, before, logits, att_ws = ref(
            torch.tensor(hs), torch.tensor(hlens), torch.tensor(ys)
        )

    # ---- graft into our step module
    step = Tacotron2DecoderStep(
        n_mels=odim, reduction_factor=1, dunits=dunits, dlayers=dlayers,
        prenet_units=prenet_units, att_dim=att_dim,
        aconv_chans=aconv_chans, aconv_filts=aconv_filts,
        prenet_dropout_rate=0.0,
    )

    def lstm_graft(cell, in_split):
        """torch LSTMCell → flax LSTMCell params. in_split: column index
        where the torch input layout [att_c | prenet] splits; None keeps
        torch column order (our input order matches)."""
        H = cell.hidden_size
        w_ih = cell.weight_ih.detach().numpy()  # (4H, in) gates i,f,g,o
        w_hh = cell.weight_hh.detach().numpy()
        b_all = (cell.bias_ih + cell.bias_hh).detach().numpy()
        if in_split is not None:
            # ours feeds [prenet | att_c]; torch was [att_c | prenet]
            w_ih = np.concatenate(
                [w_ih[:, in_split:], w_ih[:, :in_split]], axis=1
            )
        gates = {"i": 0, "f": 1, "g": 2, "o": 3}
        p = {}
        for name, gi in gates.items():
            sl = slice(gi * H, (gi + 1) * H)
            p[f"i{name}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
            p[f"h{name}"] = {
                "kernel": jnp.asarray(w_hh[sl].T),
                "bias": jnp.asarray(b_all[sl]),
            }
        return p

    att_params = {
        "mlp_enc": _lin(att.mlp_enc),
        "mlp_dec": _lin(att.mlp_dec),
        "mlp_att": _lin(att.mlp_att),
        "loc_conv": {
            "kernel": jnp.asarray(
                att.loc_conv.weight.detach().numpy()[:, 0].transpose(2, 1, 0)
            )
        },
        "gvec": _lin(att.gvec),
    }
    params = {
        "att": att_params,
        "prenet": {
            "Dense_0": _lin(ref.prenet.prenet[0][0]),
            "Dense_1": _lin(ref.prenet.prenet[1][0]),
        },
        "cells_0": lstm_graft(ref.lstm[0], in_split=eproj),
        "cells_1": lstm_graft(ref.lstm[1], in_split=None),
        "feat_out": _lin(ref.feat_out),
        "prob_out": _lin(ref.prob_out),
    }

    hs_j = jnp.asarray(hs)
    hlens_j = jnp.asarray(hlens)
    from espnet_tpu.utils.masks import make_non_pad_mask

    mask = make_non_pad_mask(hlens_j, t_enc)
    variables = {"params": params}
    enc_proj = step.apply(
        variables, hs_j, method=lambda m, h: m.att.pre_compute(h)
    )
    carry = step.apply(
        variables, b, t_enc, hlens_j, jnp.float64,
        method=lambda m, *a: m.init_state(*a),
    )
    lstm_states, att_prev, prev = carry[0], carry[1], carry[2]
    frames_all, stops_all, attw_all = [], [], []
    state = (lstm_states, att_prev)
    for i in range(L):
        state, (frames, stop, att_w) = step.apply(
            variables, state, prev, hs_j, enc_proj, mask,
        )
        frames_all.append(frames)
        stops_all.append(stop[:, 0])
        attw_all.append(att_w)
        prev = jnp.asarray(ys[:, i])  # teacher forcing

    got_frames = np.stack([np.asarray(f) for f in frames_all], axis=1)
    got_stops = np.stack([np.asarray(s) for s in stops_all], axis=1)
    got_attw = np.stack([np.asarray(w) for w in attw_all], axis=1)

    np.testing.assert_allclose(got_frames, before.numpy(), atol=1e-8)
    np.testing.assert_allclose(got_stops, logits.numpy(), atol=1e-8)
    np.testing.assert_allclose(got_attw, att_ws.numpy(), atol=1e-8)


# ------------------------------------------------------------- TTS full model


def _lstm_cell_graft(w_ih, w_hh, b_all, in_split=None):
    """torch LSTM gate block (i,f,g,o rows) → flax {i*,h*} dense params.
    in_split: column where torch's input layout [att_c | rest] splits when
    our input order is [rest | att_c]; None keeps torch column order."""
    H = w_hh.shape[1]
    if in_split is not None:
        w_ih = np.concatenate([w_ih[:, in_split:], w_ih[:, :in_split]], axis=1)
    p = {}
    for name, gi in {"i": 0, "f": 1, "g": 2, "o": 3}.items():
        sl = slice(gi * H, (gi + 1) * H)
        p[f"i{name}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        p[f"h{name}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b_all[sl]),
        }
    return p


def _lstmcell(cell, in_split=None):
    return _lstm_cell_graft(
        cell.weight_ih.detach().numpy(),
        cell.weight_hh.detach().numpy(),
        (cell.bias_ih + cell.bias_hh).detach().numpy(),
        in_split,
    )


def _bilstm(lstm, layer=0):
    """torch bidirectional nn.LSTM layer → (fwd, bwd) flax cell params."""

    def one(sfx):
        return _lstm_cell_graft(
            getattr(lstm, f"weight_ih_l{layer}{sfx}").detach().numpy(),
            getattr(lstm, f"weight_hh_l{layer}{sfx}").detach().numpy(),
            (
                getattr(lstm, f"bias_ih_l{layer}{sfx}")
                + getattr(lstm, f"bias_hh_l{layer}{sfx}")
            ).detach().numpy(),
        )

    return one(""), one("_reverse")


def _conv1d(conv):
    """torch Conv1d (C_out, C_in, K) → flax Conv kernel (K, C_in, C_out);
    reference TTS convs are bias-free, flax Conv carries a zero bias."""
    w = conv.weight.detach().numpy()
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(conv.bias.detach().numpy())
    else:
        p["bias"] = jnp.zeros((w.shape[0],), jnp.float64)
    return p


def _bn(bn):
    """torch BatchNorm1d → flax BatchNorm params + running stats."""
    return (
        {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        },
        {
            "mean": jnp.asarray(bn.running_mean.detach().numpy()),
            "var": jnp.asarray(bn.running_var.detach().numpy()),
        },
    )


def _attloc_graft(att):
    return {
        "mlp_enc": _lin(att.mlp_enc),
        "mlp_dec": _lin(att.mlp_dec),
        "mlp_att": _lin(att.mlp_att),
        "loc_conv": {
            "kernel": jnp.asarray(
                att.loc_conv.weight.detach().numpy()[:, 0].transpose(2, 1, 0)
            )
        },
        "gvec": _lin(att.gvec),
    }


@pytest.mark.parametrize("reduction_factor", [1, 2])
def test_tacotron2_full_model_parity(reduction_factor):
    """Weight-grafted FULL teacher-forced Tacotron2 forward parity
    (e2e_tts_tacotron2.py:702): encoder (embed + BN convs + BLSTM,
    tacotron2/encoder.py:23) → AttLoc decoder → postnet. Mel outputs
    before/after postnet, stop logits, and attention weights must match
    the reference to 1e-8 with dropout/zoneout off (BASELINE.md's
    "mel-spectrogram allclose" target).

    The reference modules are built directly with the exact wiring of
    e2e_tts_tacotron2.py:608-673 (its TTSInterface ctor needs chainer's
    Reporter, which is not installed here)."""
    import torch

    from espnet.nets.pytorch_backend.rnn.attentions import AttLoc
    from espnet.nets.pytorch_backend.tacotron2.decoder import (
        Decoder as RefDecoder,
    )
    from espnet.nets.pytorch_backend.tacotron2.encoder import (
        Encoder as RefEncoder,
    )

    from espnet_tpu.models.tts.tacotron2 import Tacotron2

    b, t_enc, odim = 2, 9, 5
    idim, embed_dim, econv_chans, eunits = 10, 8, 8, 8
    dunits, dlayers, prenet_units, postnet_chans = 6, 2, 4, 8
    adim, aconv_chans, aconv_filts = 7, 4, 3
    r = reduction_factor
    L = 6  # target frames (divisible by r)

    torch.manual_seed(3)

    class Ref:  # the e2e model's enc/att/dec wiring, minus chainer deps
        pass

    ref = Ref()
    ref.enc = RefEncoder(
        idim=idim, embed_dim=embed_dim, elayers=1, eunits=eunits,
        econv_layers=2, econv_chans=econv_chans, econv_filts=5,
        use_batch_norm=True, use_residual=False, dropout_rate=0.0,
        padding_idx=0,
    ).double()
    att = AttLoc(eunits, dunits, adim, aconv_chans, aconv_filts).double()
    ref.dec = RefDecoder(
        idim=eunits, odim=odim, att=att,
        dlayers=dlayers, dunits=dunits,
        prenet_layers=2, prenet_units=prenet_units,
        postnet_layers=3, postnet_chans=postnet_chans, postnet_filts=5,
        output_activation_fn=None, cumulate_att_w=True,
        use_batch_norm=True, use_concate=True,
        dropout_rate=0.0, zoneout_rate=0.0, reduction_factor=r,
    ).double()

    rng = np.random.RandomState(7)
    xs = np.zeros((b, t_enc), dtype=np.int64)
    ilens = np.array([t_enc, t_enc - 2])
    for i, n in enumerate(ilens):
        xs[i, :n] = rng.randint(1, idim, size=n)
    ys = rng.randn(b, L, odim)

    # one train-mode pass to make BatchNorm running stats non-trivial —
    # the parity then exercises real normalization, not identity stats
    ref.enc.train(), ref.dec.train()
    with torch.no_grad():
        hs0, hlens0 = ref.enc(torch.tensor(xs), torch.tensor(ilens))
        ref.dec(hs0, hlens0, torch.tensor(ys))
    ref.enc.eval(), ref.dec.eval()
    with torch.no_grad():
        hs, hlens = ref.enc(torch.tensor(xs), torch.tensor(ilens))
        after, before, logits, att_ws = ref.dec(hs, hlens, torch.tensor(ys))

    model = Tacotron2(
        vocab_size=idim, n_mels=odim, embed_dim=embed_dim,
        enc_conv_layers=2, enc_conv_chans=econv_chans,
        enc_blstm_units=eunits, dunits=dunits, dlayers=dlayers,
        prenet_units=prenet_units, postnet_chans=postnet_chans,
        postnet_layers=3,
        att_dim=adim, aconv_chans=aconv_chans, aconv_filts=aconv_filts,
        reduction_factor=r, att_type="location",
        use_guided_attn_loss=False, dropout_rate=0.0,
        prenet_dropout_rate=0.0, norm_type="batch",
    )

    enc_bn0, enc_bs0 = _bn(ref.enc.convs[0][1])
    enc_bn1, enc_bs1 = _bn(ref.enc.convs[1][1])
    fwd_cell, bwd_cell = _bilstm(ref.enc.blstm)
    enc_params = {
        "Embed_0": {"embedding": jnp.asarray(ref.enc.embed.weight.detach().numpy())},
        "Conv_0": _conv1d(ref.enc.convs[0][0]),
        "Conv_1": _conv1d(ref.enc.convs[1][0]),
        "BatchNorm_0": enc_bn0,
        "BatchNorm_1": enc_bn1,
        "OptimizedLSTMCell_0": fwd_cell,
        "OptimizedLSTMCell_1": bwd_cell,
    }
    dec_params = {
        "att": _attloc_graft(ref.dec.att),
        "prenet": {
            "Dense_0": _lin(ref.dec.prenet.prenet[0][0]),
            "Dense_1": _lin(ref.dec.prenet.prenet[1][0]),
        },
        "cells_0": _lstmcell(ref.dec.lstm[0], in_split=eunits),
        "cells_1": _lstmcell(ref.dec.lstm[1]),
        # reference views the feat_out output as (odim, r) — flat index
        # o*r+j (decoder.py: .view(B, odim, -1)); ours is (r, odim) —
        # j*odim+o. Permute rows so frame j / channel o line up.
        "feat_out": {
            "kernel": jnp.asarray(
                ref.dec.feat_out.weight.detach().numpy()[
                    [o * r + j for j in range(r) for o in range(odim)]
                ].T
            )
        },
        "prob_out": _lin(ref.dec.prob_out),
    }
    post_params, post_stats = {}, {}
    for i in range(3):
        post_params[f"Conv_{i}"] = _conv1d(ref.dec.postnet.postnet[i][0])
        p, s = _bn(ref.dec.postnet.postnet[i][1])
        post_params[f"BatchNorm_{i}"] = p
        post_stats[f"BatchNorm_{i}"] = s

    variables = {
        "params": {
            "enc": enc_params, "dec_step": dec_params, "postnet": post_params,
        },
        "batch_stats": {
            "enc": {"BatchNorm_0": enc_bs0, "BatchNorm_1": enc_bs1},
            "postnet": post_stats,
        },
    }

    def fwd(m, text, tl, targets):
        enc_h = m.enc(text, tl, True)
        bef, stop, attw = m._decode_teacher(enc_h, tl, targets, True)
        aft = bef + m.postnet(bef, True)
        return enc_h, bef, aft, stop, attw

    enc_h, got_before, got_after, got_stop, got_attw = model.apply(
        variables,
        jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        method=fwd,
    )

    # encoder parity on the valid region (flax RNN zero-carries past
    # length; torch pad_packed zero-pads — both zero, but compare valid)
    for i, n in enumerate(ilens):
        np.testing.assert_allclose(
            np.asarray(enc_h)[i, :n], hs.numpy()[i, :n], atol=1e-8
        )
    np.testing.assert_allclose(np.asarray(got_before), before.numpy(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_after), after.numpy(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_stop), logits.numpy(), atol=1e-8)
    np.testing.assert_allclose(np.asarray(got_attw), att_ws.numpy(), atol=1e-8)


@pytest.mark.parametrize("reduction_factor", [1, 2])
def test_transformer_tts_full_model_parity(reduction_factor):
    """Weight-grafted FULL teacher-forced Transformer-TTS forward parity
    (e2e_tts_transformer.py:689 forward): embed + scaled-pos-enc encoder
    stack → decoder-prenet + decoder stack → feat/prob heads → BN
    postnet. Mels before/after postnet and stop logits match to 1e-8.
    Reference modules built with the exact e2e wiring (:555-660); the
    e2e class itself needs chainer's Reporter."""
    import torch

    from espnet.nets.pytorch_backend.tacotron2.decoder import (
        Postnet as RefPostnet,
        Prenet as RefPrenet,
    )
    from espnet.nets.pytorch_backend.transformer.decoder import (
        Decoder as RefDecoder,
    )
    from espnet.nets.pytorch_backend.transformer.embedding import (
        ScaledPositionalEncoding as RefScaledPE,
    )
    from espnet.nets.pytorch_backend.transformer.encoder import (
        Encoder as RefEncoder,
    )
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask
    from espnet.nets.pytorch_backend.nets_utils import make_non_pad_mask

    from espnet_tpu.models.tts.transformer_tts import TransformerTTS

    b, t_enc, odim = 2, 9, 5
    idim, adim, aheads, units = 10, 8, 2, 12
    prenet_units, postnet_chans = 4, 8
    r = reduction_factor
    L = 6

    torch.manual_seed(5)
    enc_input = torch.nn.Embedding(idim, adim, padding_idx=0)
    ref_enc = RefEncoder(
        idim=idim, attention_dim=adim, attention_heads=aheads,
        linear_units=units, num_blocks=2, input_layer=enc_input,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, pos_enc_class=RefScaledPE,
        normalize_before=True,
    ).double()
    dec_input = torch.nn.Sequential(
        RefPrenet(idim=odim, n_layers=2, n_units=prenet_units,
                  dropout_rate=0.0),
        torch.nn.Linear(prenet_units, adim),
    )
    ref_dec = RefDecoder(
        odim=-1, attention_dim=adim, attention_heads=aheads,
        linear_units=units, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0, input_layer=dec_input,
        use_output_layer=False, pos_enc_class=RefScaledPE,
        normalize_before=True,
    ).double()
    feat_out = torch.nn.Linear(adim, odim * r).double()
    prob_out = torch.nn.Linear(adim, r).double()
    postnet = RefPostnet(
        idim=idim, odim=odim, n_layers=2, n_chans=postnet_chans,
        n_filts=5, use_batch_norm=True, dropout_rate=0.0,
    ).double()

    rng = np.random.RandomState(11)
    xs = np.zeros((b, t_enc), dtype=np.int64)
    ilens = np.array([t_enc, t_enc - 2])
    for i, n in enumerate(ilens):
        xs[i, :n] = rng.randint(1, idim, size=n)
    ys = rng.randn(b, L, odim)
    olens = np.array([L, L - r])

    # non-trivial BN running stats for the postnet
    postnet.train()
    with torch.no_grad():
        postnet(torch.tensor(ys).transpose(1, 2))
    postnet.eval()

    for mod in (ref_enc, ref_dec, feat_out, prob_out):
        mod.eval()
    with torch.no_grad():
        x_masks = make_non_pad_mask(list(ilens)).unsqueeze(-2)
        hs, h_masks = ref_enc(torch.tensor(xs), x_masks)
        ys_t = torch.tensor(ys)
        if r > 1:
            ys_in = ys_t[:, r - 1 :: r]
            olens_in = torch.tensor(olens // r)
        else:
            ys_in, olens_in = ys_t, torch.tensor(olens)
        ys_in = torch.cat(
            [ys_in.new_zeros((b, 1, odim)), ys_in[:, :-1]], dim=1
        )
        y_masks = make_non_pad_mask(list(olens_in.numpy())).unsqueeze(
            -2
        ) & subsequent_mask(ys_in.size(1)).unsqueeze(0)
        zs, _ = ref_dec(ys_in, y_masks, hs, h_masks)
        ref_before = feat_out(zs).view(b, -1, odim)
        ref_logits = prob_out(zs).view(b, -1)
        ref_after = ref_before + postnet(
            ref_before.transpose(1, 2)
        ).transpose(1, 2)

    model = TransformerTTS(
        vocab_size=idim, n_mels=odim, adim=adim, aheads=aheads,
        elayers=2, eunits=units, dlayers=2, dunits=units,
        prenet_units=prenet_units, prenet_dropout_rate=0.0,
        postnet_layers=2,
        postnet_chans=postnet_chans, reduction_factor=r,
        dropout_rate=0.0, norm_type="batch", dtype=jnp.float64,
    )

    def enc_layer(ref_layer):
        return {
            "LayerNorm_0": _ln(ref_layer.norm1),
            "MultiHeadedAttention_0": _mha(ref_layer.self_attn),
            "LayerNorm_1": _ln(ref_layer.norm2),
            "PositionwiseFeedForward_0": _ff(ref_layer.feed_forward),
        }

    def dec_layer(ref_layer):
        return {
            "norm1": _ln(ref_layer.norm1),
            "self_attn": _mha(ref_layer.self_attn),
            "norm2": _ln(ref_layer.norm2),
            "src_attn": _mha(ref_layer.src_attn),
            "norm3": _ln(ref_layer.norm3),
            "feed_forward": _ff(ref_layer.feed_forward),
        }

    post_params, post_stats = {}, {}
    for i in range(2):
        post_params[f"Conv_{i}"] = _conv1d(postnet.postnet[i][0])
        p, s = _bn(postnet.postnet[i][1])
        post_params[f"BatchNorm_{i}"] = p
        post_stats[f"BatchNorm_{i}"] = s

    params = {
        "embed": {
            "embedding": jnp.asarray(enc_input.weight.detach().numpy())
        },
        "enc_pos": {
            "alpha": jnp.asarray(
                ref_enc.embed[-1].alpha.detach().numpy().reshape(1)
            )
        },
        "enc_layers_0": enc_layer(ref_enc.encoders[0]),
        "enc_layers_1": enc_layer(ref_enc.encoders[1]),
        "enc_norm": _ln(ref_enc.after_norm),
        "prenet": {
            "Dense_0": _lin(ref_dec.embed[0][0].prenet[0][0]),
            "Dense_1": _lin(ref_dec.embed[0][0].prenet[1][0]),
        },
        "pre_proj": _lin(ref_dec.embed[0][1]),
        "dec_pos": {
            "alpha": jnp.asarray(
                ref_dec.embed[-1].alpha.detach().numpy().reshape(1)
            )
        },
        "dec_layers_0": dec_layer(ref_dec.decoders[0]),
        "dec_layers_1": dec_layer(ref_dec.decoders[1]),
        "dec_norm": _ln(ref_dec.after_norm),
        "feat_out": _lin(feat_out),
        "prob_out": _lin(prob_out),
        "postnet": post_params,
    }
    variables = {"params": params, "batch_stats": {"postnet": post_stats}}

    def fwd(m, text, tl, speech, sl):
        memory = m._encode(text, tl, True)
        bb, t_dec, _ = speech.shape
        rr = m.reduction_factor
        steps = t_dec // rr
        ys_groups = speech.reshape(bb, steps, rr, m.n_mels)[:, :, -1]
        go = jnp.zeros((bb, 1, m.n_mels), speech.dtype)
        frames_in = jnp.concatenate([go, ys_groups[:, :-1]], axis=1)
        frames, stop = m._decode(memory, tl, frames_in, sl // rr, True)
        before = frames.reshape(bb, steps * rr, m.n_mels)
        stop = stop.reshape(bb, steps * rr)
        after = before + m.postnet(before, True)
        return memory, before, after, stop

    memory, got_before, got_after, got_stop = model.apply(
        variables,
        jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ys),
        jnp.asarray(olens),
        method=fwd,
    )

    # tolerance note: the reference computes its positional-encoding
    # buffer in float32 and casts to double (embedding.py extend_pe);
    # ours is exact f64. The ~6e-8 table delta amplifies to ~3.5e-6
    # through the normalized stack — semantics identical, so 1e-5.
    np.testing.assert_allclose(
        np.asarray(memory), hs.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_before), ref_before.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_after), ref_after.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_stop), ref_logits.numpy(), atol=1e-5
    )


def test_fastspeech_full_model_parity():
    """Weight-grafted FULL teacher-forced FastSpeech forward parity
    (e2e_tts_fastspeech.py:567 _forward): embed+pos-enc encoder stack →
    duration predictor (log domain) → length regulator → decoder stack
    → feat_out → BN postnet. Encoder states, predicted log-durations,
    and mels before/after postnet match the reference.

    Config mirrors the e2e wiring (:455-536) with
    use_scaled_pos_enc=False and normalize_before=True (our pre-norm
    architecture; a reference-supported configuration). Tolerance 1e-5:
    the reference's positional-encoding buffer is computed in f32."""
    import torch

    from espnet.nets.pytorch_backend.fastspeech.duration_predictor import (
        DurationPredictor as RefDP,
    )
    from espnet.nets.pytorch_backend.fastspeech.length_regulator import (
        LengthRegulator as RefLR,
    )
    from espnet.nets.pytorch_backend.nets_utils import (
        make_non_pad_mask as ref_non_pad,
        make_pad_mask as ref_pad,
    )
    from espnet.nets.pytorch_backend.tacotron2.decoder import (
        Postnet as RefPostnet,
    )
    from espnet.nets.pytorch_backend.transformer.embedding import (
        PositionalEncoding as RefPE,
    )
    from espnet.nets.pytorch_backend.transformer.encoder import (
        Encoder as RefEncoder,
    )

    from espnet_tpu.models.tts.fastspeech import (
        FastSpeech2,
        length_regulate,
    )

    b, t_enc, odim = 2, 6, 5
    idim, adim, aheads, units = 10, 8, 2, 12
    postnet_chans = 8

    torch.manual_seed(9)
    enc_input = torch.nn.Embedding(idim, adim, padding_idx=0)
    ref_enc = RefEncoder(
        idim=idim, attention_dim=adim, attention_heads=aheads,
        linear_units=units, num_blocks=2, input_layer=enc_input,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, pos_enc_class=RefPE,
        normalize_before=True,
    ).double()
    ref_dp = RefDP(
        idim=adim, n_layers=2, n_chans=adim, kernel_size=3,
        dropout_rate=0.0,
    ).double()
    ref_lr = RefLR()
    ref_dec = RefEncoder(
        idim=0, attention_dim=adim, attention_heads=aheads,
        linear_units=units, num_blocks=2, input_layer=None,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, pos_enc_class=RefPE,
        normalize_before=True,
    ).double()
    feat_out = torch.nn.Linear(adim, odim).double()
    postnet = RefPostnet(
        idim=idim, odim=odim, n_layers=2, n_chans=postnet_chans,
        n_filts=5, use_batch_norm=True, dropout_rate=0.0,
    ).double()

    rng = np.random.RandomState(13)
    xs = np.zeros((b, t_enc), dtype=np.int64)
    ilens = np.array([t_enc, t_enc - 2])
    for i, n in enumerate(ilens):
        xs[i, :n] = rng.randint(1, idim, size=n)
    ds = np.array([[2, 1, 3, 2, 1, 1], [3, 2, 2, 1, 0, 0]], dtype=np.int64)
    olens = ds.sum(axis=1)  # [10, 8]
    L = int(olens.max())

    postnet.train()
    with torch.no_grad():
        postnet(torch.randn(b, odim, L, dtype=torch.float64))
    postnet.eval()
    for mod in (ref_enc, ref_dp, ref_dec, feat_out):
        mod.eval()

    with torch.no_grad():
        x_masks = ref_non_pad(list(ilens)).unsqueeze(-2)
        hs, _ = ref_enc(torch.tensor(xs), x_masks)
        d_masks = ref_pad(list(ilens))
        d_outs = ref_dp(hs, d_masks)
        hd = ref_lr(hs, torch.tensor(ds))
        h_masks = ref_non_pad(list(olens)).unsqueeze(-2)
        zs, _ = ref_dec(hd, h_masks)
        ref_before = feat_out(zs).view(b, -1, odim)
        ref_after = ref_before + postnet(
            ref_before.transpose(1, 2)
        ).transpose(1, 2)

    model = FastSpeech2(
        vocab_size=idim, n_mels=odim, adim=adim, aheads=aheads,
        elayers=2, eunits=units, dlayers=2, dunits=units,
        use_pitch=False, use_energy=False,
        postnet_layers=2, postnet_chans=postnet_chans,
        dropout_rate=0.0, norm_type="batch", dtype=jnp.float64,
    )

    def enc_layer(ref_layer):
        return {
            "LayerNorm_0": _ln(ref_layer.norm1),
            "MultiHeadedAttention_0": _mha(ref_layer.self_attn),
            "LayerNorm_1": _ln(ref_layer.norm2),
            "PositionwiseFeedForward_0": _ff(ref_layer.feed_forward),
        }

    dp_params = {
        "Conv_0": _conv1d(ref_dp.conv[0][0]),
        "LayerNorm_0": _ln(ref_dp.conv[0][2]),
        "Conv_1": _conv1d(ref_dp.conv[1][0]),
        "LayerNorm_1": _ln(ref_dp.conv[1][2]),
        "Dense_0": _lin(ref_dp.linear),
    }
    post_params, post_stats = {}, {}
    for i in range(2):
        post_params[f"Conv_{i}"] = _conv1d(postnet.postnet[i][0])
        p, s = _bn(postnet.postnet[i][1])
        post_params[f"BatchNorm_{i}"] = p
        post_stats[f"BatchNorm_{i}"] = s

    params = {
        "embed": {
            "embedding": jnp.asarray(enc_input.weight.detach().numpy())
        },
        "enc_layers_0": enc_layer(ref_enc.encoders[0]),
        "enc_layers_1": enc_layer(ref_enc.encoders[1]),
        "enc_norm": _ln(ref_enc.after_norm),
        "duration_predictor": dp_params,
        "dec_layers_0": enc_layer(ref_dec.encoders[0]),
        "dec_layers_1": enc_layer(ref_dec.encoders[1]),
        "dec_norm": _ln(ref_dec.after_norm),
        "feat_out": _lin(feat_out),
        "postnet": post_params,
    }
    variables = {"params": params, "batch_stats": {"postnet": post_stats}}

    def fwd(m, text, tl, ds_j, out_len, olens_j):
        h = m._encode(text, tl, True)
        d_pred = m.duration_predictor(h, True)
        hd = length_regulate(h, ds_j, out_len)
        before = m._decode(hd, olens_j, out_len, True)
        after = before + m.postnet(before, True)
        return h, d_pred, before, after

    h, d_pred, got_before, got_after = model.apply(
        variables,
        jnp.asarray(xs), jnp.asarray(ilens), jnp.asarray(ds), L,
        jnp.asarray(olens),
        method=fwd,
    )

    np.testing.assert_allclose(np.asarray(h), hs.numpy(), atol=1e-5)
    # reference zeroes padded-token durations via masked_fill
    tok_mask = np.arange(t_enc)[None] < ilens[:, None]
    np.testing.assert_allclose(
        np.asarray(d_pred) * tok_mask, d_outs.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_before), ref_before.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_after), ref_after.numpy(), atol=1e-5
    )
