"""Config-driven mixed-architecture transducer blocks (reference:
espnet/nets/pytorch_backend/transducer/blocks.py:463 build_blocks,
tdnn.py TDNN, causal_conv1d.py CausalConv1d, transformer_decoder.py).

A block list like
    [{"type": "conv2d", ...subsampling...},
     {"type": "tdnn", "odim": 256, "ctx_size": 3, "dilation": 1, "stride": 2},
     {"type": "transformer", "d_hidden": 256, "heads": 4, "units": 1024},
     {"type": "conformer", "d_hidden": 256, "heads": 4, "units": 1024}]
builds an encoder stack; prediction-net stacks use
{"type": "causal_conv1d" | "transformer"} with causal masking.

TransformerPredictionNet is the reference's transformer prediction net
(transducer/transformer_decoder.py) exposing the same init_carry/step
contract as the LSTM PredictionNet: the step carry holds a fixed-size
token ring buffer; each step re-runs the causal stack over the buffered
prefix — O(U²) total at decode but fully jittable and exact.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.layers.attention import MultiHeadedAttention
from espnet_tpu.layers.convolution import ConformerConvModule
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.utils.masks import make_non_pad_mask


class TDNNBlock(nn.Module):
    """1D time-delay block: conv over ctx_size frames with dilation and
    stride (subsampling) + ReLU + LayerNorm (reference transducer/tdnn.py)."""

    odim: int
    ctx_size: int = 3
    dilation: int = 1
    stride: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        xs = nn.Conv(
            self.odim,
            (self.ctx_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
        )(xs)
        xs = nn.relu(xs)
        xs = nn.LayerNorm(epsilon=1e-12)(xs)
        xs = nn.Dropout(self.dropout_rate)(xs, deterministic=deterministic)
        if self.stride > 1:
            ilens = (ilens + self.stride - 1) // self.stride
        return xs, ilens


class CausalConv1dBlock(nn.Module):
    """Left-padded (causal) conv block for prediction nets (reference
    transducer/causal_conv1d.py)."""

    odim: int
    kernel_size: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        pad = self.kernel_size - 1
        h = jnp.pad(xs, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(self.odim, (self.kernel_size,), padding="VALID")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h, ilens


class SelfAttentionBlock(nn.Module):
    """Pre-norm transformer layer (self-attention + FF); causal flag for
    prediction-net use."""

    d_hidden: int
    heads: int = 4
    units: int = 1024
    dropout_rate: float = 0.1
    causal: bool = False

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        b, t, d = xs.shape
        if d != self.d_hidden:
            xs = nn.Dense(self.d_hidden)(xs)
        pad = make_non_pad_mask(ilens, t)  # (B, T)
        mask = pad[:, None, None, :]  # (B, 1, 1, Tk)
        if self.causal:
            tri = jnp.tril(jnp.ones((t, t), bool))
            mask = mask & tri[None, None]
        drop = nn.Dropout(self.dropout_rate)
        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = MultiHeadedAttention(self.heads, self.d_hidden, self.dropout_rate)(
            h, h, h, mask, deterministic=deterministic
        )
        xs = res + drop(h, deterministic=deterministic)
        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = PositionwiseFeedForward(self.units, self.dropout_rate)(
            h, deterministic=deterministic
        )
        xs = res + drop(h, deterministic=deterministic)
        return xs, ilens


class ConformerBlock(nn.Module):
    """Macaron FF + self-attention + depthwise conv + FF (absolute-pos
    flavour for mixed stacks)."""

    d_hidden: int
    heads: int = 4
    units: int = 1024
    kernel_size: int = 15
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        b, t, d = xs.shape
        if d != self.d_hidden:
            xs = nn.Dense(self.d_hidden)(xs)
        pad = make_non_pad_mask(ilens, t)
        mask = pad[:, None, None, :]
        drop = nn.Dropout(self.dropout_rate)

        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = PositionwiseFeedForward(self.units, self.dropout_rate, "swish")(
            h, deterministic=deterministic
        )
        xs = res + 0.5 * drop(h, deterministic=deterministic)

        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = MultiHeadedAttention(self.heads, self.d_hidden, self.dropout_rate)(
            h, h, h, mask, deterministic=deterministic
        )
        xs = res + drop(h, deterministic=deterministic)

        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = ConformerConvModule(self.kernel_size)(h, pad, deterministic)
        xs = res + drop(h, deterministic=deterministic)

        res = xs
        h = nn.LayerNorm(epsilon=1e-12)(xs)
        h = PositionwiseFeedForward(self.units, self.dropout_rate, "swish")(
            h, deterministic=deterministic
        )
        xs = nn.LayerNorm(epsilon=1e-12)(res + 0.5 * drop(h, deterministic=deterministic))
        return xs, ilens


BLOCK_TYPES = {
    "tdnn": TDNNBlock,
    "causal_conv1d": CausalConv1dBlock,
    "transformer": SelfAttentionBlock,
    "conformer": ConformerBlock,
}


def freeze_blocks(block_confs: Sequence[Dict[str, Any]]):
    """yaml list-of-dicts → hashable tuple-of-tuples for BlockEncoder."""
    return tuple(tuple(sorted(dict(b).items())) for b in block_confs)


def build_blocks(block_confs: Sequence[Dict[str, Any]], causal: bool = False):
    """[{type: ..., ...}] → list of block modules (build_blocks:463)."""
    blocks = []
    for conf in block_confs:
        conf = dict(conf)
        typ = conf.pop("type")
        cls = BLOCK_TYPES[typ]
        if typ == "transformer":
            conf.setdefault("causal", causal)
        blocks.append(cls(**conf))
    return blocks


class BlockEncoder(nn.Module):
    """Mixed-architecture encoder from a block config list; usable as the
    TransducerModel encoder via config `encoder: custom` +
    `encoder_conf: {blocks: [...]}`."""

    # each block conf frozen as tuple(sorted(dict.items())) so the module
    # stays hashable for jit caching; freeze_blocks() converts
    blocks: Tuple[Tuple[Tuple[str, Any], ...], ...] = ()
    input_proj: Optional[int] = None

    @nn.compact
    def __call__(self, xs, ilens, deterministic: bool = True):
        if self.input_proj:
            xs = nn.Dense(self.input_proj)(xs)
        for block in build_blocks([dict(b) for b in self.blocks]):
            xs, ilens = block(xs, ilens, deterministic=deterministic)
        xs = xs * make_non_pad_mask(ilens, xs.shape[1])[..., None]
        return xs, ilens


class TransformerPredictionNet(nn.Module):
    """Causal-transformer prediction net with the LSTM PredictionNet's
    interface: __call__(labels) for training lattices; init_carry/step
    for decoding (carry = fixed ring buffer of emitted tokens)."""

    vocab_size: int
    dunits: int = 256
    layers: int = 2
    heads: int = 4
    units: int = 1024
    dropout_rate: float = 0.1
    max_decode_len: int = 256  # step-buffer capacity

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.dunits)
        self.blocks = [
            SelfAttentionBlock(
                self.dunits, self.heads, self.units, self.dropout_rate,
                causal=True,
            )
            for _ in range(self.layers)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-12)

    def _stack(self, xs, ilens, deterministic: bool = True):
        for block in self.blocks:
            xs, ilens = block(xs, ilens, deterministic=deterministic)
        return self.norm(xs)

    def __call__(self, labels: jnp.ndarray, deterministic: bool = True):
        """labels (B, U) → g (B, U+1, D): position u conditions on
        labels[<u], blank-started (matches PredictionNet semantics)."""
        b, u = labels.shape
        labels_c = jnp.where(labels < 0, 0, labels)
        tokens = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), labels_c], axis=1
        )  # blank start
        xs = self.embed(tokens)
        lens = jnp.full((b,), u + 1, jnp.int32)
        return self._stack(xs, lens, deterministic)

    def init_carry(self, batch: int, dtype=jnp.float32):
        buf = jnp.zeros((batch, self.max_decode_len), jnp.int32)
        pos = jnp.zeros((batch,), jnp.int32)
        return (buf, pos)

    def step(self, carry, token):
        """Append token, re-run the causal stack over the buffer, return
        the new hidden at the appended position."""
        buf, pos = carry
        b, cap = buf.shape
        upos = jnp.arange(cap)[None, :]
        buf = jnp.where(upos == pos[:, None], token[:, None], buf)
        pos_new = jnp.minimum(pos + 1, cap - 1)
        xs = self.embed(buf)
        h = self._stack(xs, pos_new, True)
        g = jnp.take_along_axis(h, pos[:, None, None], axis=1)[:, 0]
        return (buf, pos_new), g
