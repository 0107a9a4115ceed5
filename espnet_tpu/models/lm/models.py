"""Language models (reference: espnet2/lm/seq_rnn_lm.py:12,
transformer_lm.py:14, espnet/nets/pytorch_backend/lm/default.py).

Both models predict the next token; `lm_nll` gives the masked NLL used
for training and perplexity (espnet2/lm/espnet_model.py:25). Scorer
access for beam-search fusion:
  TransformerLM.score_prefix(yseq, pos)      — stateless recompute
  SequentialRNNLM.step(carry, token)         — stateful single step
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.layers.embedding import PositionalEncoding, sinusoidal_table
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.layers.attention import MultiHeadedAttention
from espnet_tpu.utils.masks import make_non_pad_mask, subsequent_mask


class SequentialRNNLM(nn.Module):
    vocab_size: int
    units: int = 650
    layers: int = 2
    cell_type: str = "lstm"
    dropout_rate: float = 0.0
    tie_weights: bool = False

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.units)
        cell_cls = nn.LSTMCell if self.cell_type == "lstm" else nn.GRUCell
        self.cells = [cell_cls(self.units) for _ in range(self.layers)]
        self.out = nn.Dense(self.vocab_size)
        self.dropout = nn.Dropout(self.dropout_rate)

    def init_carry(self, batch: int, dtype=jnp.float32):
        if self.cell_type == "lstm":
            return tuple(
                (jnp.zeros((batch, self.units), dtype), jnp.zeros((batch, self.units), dtype))
                for _ in range(self.layers)
            )
        return tuple(jnp.zeros((batch, self.units), dtype) for _ in range(self.layers))

    def step(self, carry, token):
        """One step: (carry, (B,) token) → (new_carry, (B, V) logits)."""
        x = self.embed(token)
        new = []
        for i, cell in enumerate(self.cells):
            c, x = cell(carry[i], x)
            new.append(c)
        return tuple(new), self.out(x)

    def forward_carry(self, carry, tokens: jnp.ndarray):
        """BPTT window: (carry, (B, L) tokens) → (new_carry, (B, L, V)).

        Hidden state flows in/out so the caller can thread it across
        windows of the concatenated corpus stream (reference BPTT LM
        training, espnet/lm/chainer_backend/lm.py ParallelSequential
        semantics)."""

        def body(mdl, carry, tok):
            return mdl.step(carry, tok)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        return scan(self, carry, tokens)

    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        """(B, L) → (B, L, V) next-token logits."""
        b, l = tokens.shape
        _, logits = self.forward_carry(self.init_carry(b), tokens)
        return logits


class TransformerLMLayer(nn.Module):
    """Pre-norm self-attention + FF block with a KV-cached `step` for
    incremental beam-search scoring (mirrors TransformerDecoderLayer.step,
    models/asr/transformer_decoder.py, minus cross-attention)."""

    attention_dim: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.attention_dim, dtype=self.dtype
        )
        self.norm2 = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask, deterministic: bool = True):
        residual = x
        h = self.norm1(x)
        h = self.self_attn(h, h, h, mask, deterministic=deterministic)
        x = residual + self.dropout(h, deterministic=deterministic)
        residual = x
        h = self.norm2(x)
        h = self.feed_forward(h, deterministic=deterministic)
        return residual + self.dropout(h, deterministic=deterministic)

    def step(self, x_t, cache_k, cache_v, pos):
        """One query position with KV cache: x_t (N, 1, D),
        cache_k/v (N, Lmax, H, Dk), pos (N,) → (y_t, k, v)."""
        from espnet_tpu.layers.attention import MASK_MIN

        n, lmax, h, dk = cache_k.shape
        att = self.self_attn
        residual = x_t
        x = self.norm1(x_t)
        q = att.linear_q(x).reshape(n, 1, h, dk)
        k_t = att.linear_k(x).reshape(n, h, dk)
        v_t = att.linear_v(x).reshape(n, h, dk)
        onehot = jax.nn.one_hot(pos, lmax, dtype=cache_k.dtype)  # (N, Lmax)
        oh = onehot[..., None, None]
        cache_k = cache_k * (1 - oh) + oh * k_t[:, None]
        cache_v = cache_v * (1 - oh) + oh * v_t[:, None]
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, cache_k) / jnp.sqrt(
            jnp.asarray(dk, dtype=q.dtype)
        )
        valid = jnp.arange(lmax)[None, :] <= pos[:, None]
        scores = jnp.where(valid[:, None, None, :], scores, MASK_MIN)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, cache_v).reshape(n, 1, h * dk)
        x = residual + att.linear_out(out)
        residual = x
        xf = self.norm2(x)
        x = residual + self.feed_forward(xf)
        return x, cache_k, cache_v


class TransformerLM(nn.Module):
    vocab_size: int
    attention_dim: int = 256
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.attention_dim, dtype=self.dtype)
        self.pos_enc = PositionalEncoding(self.attention_dim, self.dropout_rate)
        self.layers = [
            TransformerLMLayer(
                self.attention_dim, self.attention_heads, self.linear_units,
                self.dropout_rate, self.dtype,
            )
            for _ in range(self.num_blocks)
        ]
        self.final_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.output = nn.Dense(self.vocab_size)

    def __call__(
        self,
        tokens: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l = tokens.shape
        x = self.embed(tokens)
        x = self.pos_enc(x, deterministic=deterministic)
        mask = subsequent_mask(l)[None]
        if lengths is not None:
            mask = mask & make_non_pad_mask(lengths, l)[:, None, :]
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        x = self.final_norm(x)
        return self.output(x.astype(jnp.float32))

    def score_prefix(self, yseq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Next-token log-probs after yseq[:, :pos+1] → (N, V)."""
        logits = self(yseq, None, deterministic=True)
        pos = jnp.broadcast_to(jnp.asarray(pos), (yseq.shape[0],))
        sel = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
        return nn.log_softmax(sel, axis=-1)

    def init_cache(self, n: int, lmax: int):
        """Per-layer KV buffers for incremental scoring."""
        dk = self.attention_dim // self.attention_heads
        shape = (n, lmax, self.attention_heads, dk)
        return {
            f"layer_{i}": {
                "k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype),
            }
            for i in range(self.num_blocks)
        }

    def score_step(self, cache, token: jnp.ndarray, pos: jnp.ndarray):
        """Next-token log-probs with cache update → ((N, V), cache).
        One token's FLOPs per step — the beam-search fast path
        (reference TransformerLM implements BatchScorerInterface,
        espnet/nets/pytorch_backend/lm/transformer.py:18)."""
        n = token.shape[0]
        x = self.embed(token)[:, None, :]
        x = x * jnp.sqrt(float(self.attention_dim)).astype(x.dtype)
        lmax = next(iter(cache.values()))["k"].shape[1]
        pe = sinusoidal_table(lmax, self.attention_dim, x.dtype)
        x = x + jnp.take_along_axis(
            jnp.broadcast_to(pe[None], (n, lmax, self.attention_dim)),
            pos[:, None, None],
            axis=1,
        )
        new_cache = {}
        for i, layer in enumerate(self.layers):
            c = cache[f"layer_{i}"]
            x, ck, cv = layer.step(x, c["k"], c["v"], pos)
            new_cache[f"layer_{i}"] = {"k": ck, "v": cv}
        x = self.final_norm(x)
        logits = self.output(x.astype(jnp.float32))[:, 0]
        return nn.log_softmax(logits, axis=-1), new_cache




class ScannedTransformerLM(nn.Module):
    """TransformerLM with the layer stack as a jax.lax.scan over ONE
    layer's stacked params — the compiled program (and its serialized
    HLO) is CONSTANT in depth instead of linear. TPU-first rationale:
    deep stacks unrolled per-layer inflate compile time and, under the
    remote-compile tunnel, the 16-block reference LM's beam-60 program
    exceeds the upload size limit (HTTP 413, measured r5); the scanned
    form ships one layer body. Param tree differs from TransformerLM
    (leading L axis on every layer leaf) — fresh models only; same
    scorer surface (__call__/score_prefix/init_cache/score_step)."""

    vocab_size: int
    attention_dim: int = 256
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.attention_dim, dtype=self.dtype)
        self.pos_enc = PositionalEncoding(self.attention_dim, self.dropout_rate)
        self.final_norm = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)
        self.output = nn.Dense(self.vocab_size)
        # ONE layer submodule; function-target nn.scans stack its params
        # along a leading num_blocks axis (variable_axes={"params": 0})
        # and both the forward and the cached step share them
        self.layer = TransformerLMLayer(
            self.attention_dim, self.attention_heads, self.linear_units,
            self.dropout_rate, self.dtype,
        )

    def _scan(self, body):
        return nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
        )

    def __call__(
        self,
        tokens: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l = tokens.shape
        x = self.embed(tokens)
        x = self.pos_enc(x, deterministic=deterministic)
        mask = subsequent_mask(l)[None]
        if lengths is not None:
            mask = mask & make_non_pad_mask(lengths, l)[:, None, :]

        def fwd(layer, carry, _):
            x, mask = carry
            return (layer(x, mask, deterministic=deterministic), mask), None

        (x, _), _ = self._scan(fwd)(self.layer, (x, mask), None)
        x = self.final_norm(x)
        return self.output(x.astype(jnp.float32))

    def score_prefix(self, yseq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        logits = self(yseq, None, deterministic=True)
        pos = jnp.broadcast_to(jnp.asarray(pos), (yseq.shape[0],))
        sel = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
        return nn.log_softmax(sel, axis=-1)

    def init_cache(self, n: int, lmax: int):
        # hypothesis axis FIRST: beam search gathers scorer states along
        # axis 0 after pruning; the layer axis (scanned) sits at axis 1
        dk = self.attention_dim // self.attention_heads
        shape = (n, self.num_blocks, lmax, self.attention_heads, dk)
        return {"k": jnp.zeros(shape, self.dtype), "v": jnp.zeros(shape, self.dtype)}

    def score_step(self, cache, token: jnp.ndarray, pos: jnp.ndarray):
        n = token.shape[0]
        x = self.embed(token)[:, None, :]
        x = x * jnp.sqrt(float(self.attention_dim)).astype(x.dtype)
        lmax = cache["k"].shape[2]
        pe = sinusoidal_table(lmax, self.attention_dim, x.dtype)
        x = x + jnp.take_along_axis(
            jnp.broadcast_to(pe[None], (n, lmax, self.attention_dim)),
            pos[:, None, None],
            axis=1,
        )

        def step(layer, carry, cache_kv):
            x_t, pos = carry
            k, v = cache_kv
            y, k2, v2 = layer.step(x_t, k, v, pos)
            return (y, pos), (k2, v2)

        step_scan = nn.scan(
            step,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=1,   # cache layer axis (hyp axis 0 stays put)
            out_axes=1,
            length=self.num_blocks,
        )
        (x, _), (k2, v2) = step_scan(
            self.layer, (x, pos), (cache["k"], cache["v"])
        )
        x = self.final_norm(x)
        logits = self.output(x.astype(jnp.float32))[:, 0]
        return nn.log_softmax(logits, axis=-1), {"k": k2, "v": v2}


def lm_nll(
    logits: jnp.ndarray, targets: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked NLL: logits (B, L, V) vs targets (B, L).

    Returns (total_nll, total_tokens) — perplexity = exp(nll/tokens)
    (reference lm_calc_perplexity.py)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].clip(0), axis=-1)[..., 0]
    mask = make_non_pad_mask(lengths, targets.shape[1])
    return (nll * mask).sum(), mask.sum()
