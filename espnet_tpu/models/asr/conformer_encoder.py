"""Conformer encoder (reference: conformer/encoder.py:36,
conformer/encoder_layer.py:17).

Macaron FF(×1/2) → rel-pos MHSA → depthwise conv module → FF(×1/2), each
with pre-norm residual, plus a final LayerNorm. Relative positional
encoding feeds every layer.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.layers.attention import RelPositionMultiHeadedAttention
from espnet_tpu.layers.convolution import ConformerConvModule
from espnet_tpu.layers.embedding import RelPositionalEncoding
from espnet_tpu.layers.feed_forward import PositionwiseFeedForward
from espnet_tpu.layers.subsampling import Conv2dSubsampling
from espnet_tpu.utils.masks import make_non_pad_mask


class ConformerEncoderLayer(nn.Module):
    attention_dim: int
    attention_heads: int
    linear_units: int
    cnn_kernel: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    use_macaron: bool = True
    use_cnn: bool = True
    # fused Pallas conv module is OPT-IN (True); None/False = unfused
    # XLA path (see layers/convolution.py _fused_ok for the rationale);
    # the encoder forces False under sequence parallelism
    conv_use_fused: "bool | None" = None
    # True restores the reference's BatchNorm inside the conv module
    # (conformer/convolution.py:46) for exact-parity runs; default stays
    # GroupNorm(1) (see layers/convolution.py docstring)
    conv_use_batch_norm: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, attn_mask, pad_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout_rate)
        ff_scale = 0.5 if self.use_macaron else 1.0

        if self.use_macaron:
            residual = x
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
            x = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, activation="swish",
                dtype=self.dtype,
            )(x, deterministic=deterministic)
            x = residual + ff_scale * drop(x, deterministic=deterministic)

        residual = x
        x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        x = RelPositionMultiHeadedAttention(
            self.attention_heads, self.attention_dim, self.attention_dropout_rate,
            dtype=self.dtype,
        )(x, x, x, pos_emb, attn_mask, deterministic=deterministic)
        x = residual + drop(x, deterministic=deterministic)

        if self.use_cnn:
            residual = x
            x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
            x = ConformerConvModule(
                self.cnn_kernel,
                use_batch_norm=self.conv_use_batch_norm,
                use_fused=self.conv_use_fused,
                dtype=self.dtype,
            )(x, pad_mask, deterministic=deterministic)
            x = residual + drop(x, deterministic=deterministic)

        residual = x
        x = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)
        x = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, activation="swish",
            dtype=self.dtype,
        )(x, deterministic=deterministic)
        x = residual + ff_scale * drop(x, deterministic=deterministic)

        return nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(x)


class ConformerEncoder(nn.Module):
    attention_dim: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    cnn_kernel: int = 31
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    use_macaron: bool = True
    use_cnn: bool = True
    # rematerialize each block in backward (jax.checkpoint): ~30% more
    # compute for O(num_blocks) less activation memory — lifts the max
    # trainable batch size
    remat: bool = False
    # sequence parallelism: shard block activations (B, T, D) as
    # P(batch_axis, seq_axis, None) between blocks — the norm/FF/conv
    # regions then compute on T/seq_axis-sized shards and XLA inserts the
    # gathers attention needs. Requires running under jax.set_mesh with
    # axes of these names (see __graft_entry__.dryrun_multichip).
    seq_axis: "str | None" = None
    batch_axis: str = "data"
    # True = opt-in fused Pallas conv module (config: encoder_conf
    # conv_use_fused); forced off under sequence parallelism
    conv_use_fused: "bool | None" = None
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, ilens: jnp.ndarray, deterministic: bool = True):
        if self.input_layer in ("conv2d", "conv2d6", "conv2d8"):
            factor = {"conv2d": 4, "conv2d6": 6, "conv2d8": 8}[self.input_layer]
            xs, olens = Conv2dSubsampling(
                self.attention_dim, factor, dtype=self.dtype
            )(xs.astype(self.dtype), ilens, deterministic=deterministic)
        elif self.input_layer == "linear":
            xs = nn.Dense(self.attention_dim)(xs)
            xs = nn.LayerNorm(dtype=self.dtype, epsilon=1e-12)(xs)
            olens = ilens
        else:
            raise ValueError(self.input_layer)
        xs, pos_emb = RelPositionalEncoding(
            self.attention_dim, self.positional_dropout_rate
        )(xs, deterministic=deterministic)
        pad_mask = make_non_pad_mask(olens, xs.shape[1])  # (B, T)
        attn_mask = pad_mask[:, None, :]  # (B, 1, T)
        layer_cls = ConformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(ConformerEncoderLayer, static_argnums=(5,))
        def seq_shard(x):
            if self.seq_axis is None:
                return x
            from jax.sharding import PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, P(self.batch_axis, self.seq_axis, None)
            )

        xs = seq_shard(xs)
        for _ in range(self.num_blocks):
            xs = layer_cls(
                self.attention_dim,
                self.attention_heads,
                self.linear_units,
                self.cnn_kernel,
                self.dropout_rate,
                self.attention_dropout_rate,
                self.use_macaron,
                self.use_cnn,
                conv_use_fused=False if self.seq_axis else self.conv_use_fused,
                dtype=self.dtype,
            )(xs, pos_emb, attn_mask, pad_mask, deterministic)
            xs = seq_shard(xs)
        return xs.astype(jnp.float32), olens
