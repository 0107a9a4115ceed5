"""Scorer adapters binding model params to the BeamSearch FullScorer
protocol (≙ reference scorers/: decoder, LM fusion, length bonus;
scorer_interface.py contract).

Each builder stores the bound variables in FullScorer.params (NOT a
closure capture), so callers can jit the whole search with the weights
as arguments — captured weight constants serialize into the compile
payload, which bloats compile time on any TPU and exceeds request
limits under a remote-compile tunnel at d>=512 scale. Per-utterance
tensors (tiled encoder memory) are stashed by init() and shared across
steps without living in the pruned state.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from espnet_tpu.search.beam_search import FullScorer
from espnet_tpu.utils.masks import make_non_pad_mask


def transformer_decoder_scorer(decoder, variables, weight: float) -> FullScorer:
    """Stateless: re-runs the causal decoder over the static prefix buffer
    (one batched matmul stack per step — MXU-friendly)."""
    cache: Dict[str, Any] = {}

    def init(params, mem, mem_lens, maxlen=None):
        cache["mem"], cache["lens"] = mem, mem_lens
        return ()

    def score(params, state, yseq, pos):
        logp = decoder.apply(
            params, cache["mem"], cache["lens"], yseq, pos, method="score_prefix"
        )
        return logp, state

    return FullScorer(weight, init, score, params=variables)


def rnn_decoder_scorer(decoder, variables, weight: float) -> FullScorer:
    """Stateful: LSTM carries + location-attention weights as beam state."""
    cache: Dict[str, Any] = {}

    def init(params, mem, mem_lens, maxlen=None):
        cache["mem"], cache["lens"] = mem, mem_lens
        n, t, _ = mem.shape
        cache["mask"] = make_non_pad_mask(mem_lens, t)
        cache["enc_proj"] = decoder.apply(
            params, mem, method=lambda m, x: m.step.att.pre_compute(x)
        )
        dunits = decoder.dunits
        states = tuple(
            (jnp.zeros((n, dunits)), jnp.zeros((n, dunits)))
            for _ in range(decoder.dlayers)
        )
        att_prev = cache["mask"].astype(mem.dtype) / jnp.maximum(
            mem_lens[:, None], 1
        ).astype(mem.dtype)
        return (states, att_prev)

    def score(params, state, yseq, pos):
        token = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]
        (new_carry, (logits, _)) = decoder.apply(
            params,
            state,
            token,
            cache["mem"],
            cache["enc_proj"],
            cache["mask"],
            method="score_step",
        )
        return jax.nn.log_softmax(logits, axis=-1), new_carry

    return FullScorer(weight, init, score, params=variables)


def transformer_lm_scorer(lm, variables, weight: float) -> FullScorer:
    def init(params, mem, mem_lens, maxlen=None):
        return ()

    def score(params, state, yseq, pos):
        logp = lm.apply(params, yseq, pos, method="score_prefix")
        return logp, state

    return FullScorer(weight, init, score, params=variables)


def transformer_lm_cached_scorer(lm, variables, weight: float) -> FullScorer:
    """KV-cached incremental transformer-LM scorer — one token's FLOPs
    per beam step (vs transformer_lm_scorer's full-prefix recompute);
    the right scorer for large-beam operating points (reference
    decode_pytorch_transformer_large.yaml: beam 60, lm-weight 0.6)."""

    def init(params, mem, mem_lens, maxlen):
        n = mem.shape[0]
        return lm.apply(params, n, maxlen, method="init_cache")

    def score(params, state, yseq, pos):
        token = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]
        logp, new_cache = lm.apply(
            params, state, token, pos, method="score_step"
        )
        return logp, new_cache

    return FullScorer(weight, init, score, params=variables)


def rnn_lm_scorer(lm, variables, weight: float) -> FullScorer:
    def init(params, mem, mem_lens, maxlen=None):
        n = mem.shape[0]
        return lm.apply(params, n, method="init_carry")

    def score(params, state, yseq, pos):
        token = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]
        new_carry, logits = lm.apply(params, state, token, method="step")
        return jax.nn.log_softmax(logits, axis=-1), new_carry

    return FullScorer(weight, init, score, params=variables)


def transformer_decoder_cached_scorer(decoder, variables, weight: float) -> FullScorer:
    """KV-cached incremental decoder scorer — O(1) prefix work per step
    (the fast path; transformer_decoder_scorer is the stateless
    reference)."""
    cache_env: Dict[str, Any] = {}

    def init(params, mem, mem_lens, maxlen):
        cache_env["mem"], cache_env["lens"] = mem, mem_lens
        n = mem.shape[0]
        return decoder.apply(params, n, maxlen, method="init_cache")

    def score(params, state, yseq, pos):
        token = jnp.take_along_axis(yseq, pos[:, None], axis=1)[:, 0]
        logp, new_cache = decoder.apply(
            params, state, cache_env["mem"], cache_env["lens"], token, pos,
            method="score_step",
        )
        return logp, new_cache

    return FullScorer(weight, init, score, params=variables)
