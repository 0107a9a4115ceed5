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

from espnet_tpu.layers.embedding import PositionalEncoding
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


class TransformerLM(nn.Module):
    vocab_size: int
    attention_dim: int = 256
    attention_heads: int = 2
    linear_units: int = 1024
    num_blocks: int = 4
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.attention_dim, dtype=self.dtype)(tokens)
        x = PositionalEncoding(self.attention_dim, self.dropout_rate)(
            x, deterministic=deterministic
        )
        mask = subsequent_mask(l)[None]
        if lengths is not None:
            mask = mask & make_non_pad_mask(lengths, l)[:, None, :]
        for _ in range(self.num_blocks):
            residual = x
            h = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
            h = MultiHeadedAttention(
                self.attention_heads, self.attention_dim, dtype=self.dtype
            )(h, h, h, mask, deterministic=deterministic)
            x = residual + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            residual = x
            h = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
            h = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, dtype=self.dtype
            )(h, deterministic=deterministic)
            x = residual + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        return nn.Dense(self.vocab_size)(x.astype(jnp.float32))

    def score_prefix(self, yseq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Next-token log-probs after yseq[:, :pos+1] → (N, V)."""
        logits = self(yseq, None, deterministic=True)
        pos = jnp.broadcast_to(jnp.asarray(pos), (yseq.shape[0],))
        sel = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
        return nn.log_softmax(sel, axis=-1)


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
