"""Position-wise feed forward (reference:
transformer/positionwise_feed_forward.py)."""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(x)


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "swish": swish,
    "tanh": nn.tanh,
}


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d_model = x.shape[-1]
        h = nn.Dense(self.hidden_units, dtype=self.dtype)(x)
        h = ACTIVATIONS[self.activation](h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d_model, dtype=self.dtype)(h)


class MultiLayeredConv1d(nn.Module):
    """Two same-pad conv1d layers with ReLU (reference
    transformer/multi_layer_conv.py:12 MultiLayeredConv1d — the
    FastSpeech-style positionwise layer, selectable as
    positionwise_layer_type="conv1d")."""

    hidden_units: int
    kernel_size: int = 3
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d_model = x.shape[-1]
        h = nn.Conv(
            self.hidden_units, (self.kernel_size,), padding="SAME",
            dtype=self.dtype,
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Conv(
            d_model, (self.kernel_size,), padding="SAME", dtype=self.dtype
        )(h)


class Conv1dLinear(nn.Module):
    """Conv1d + linear positionwise layer (reference
    multi_layer_conv.py:66 Conv1dLinear,
    positionwise_layer_type="conv1d-linear")."""

    hidden_units: int
    kernel_size: int = 3
    dropout_rate: float = 0.1
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d_model = x.shape[-1]
        h = nn.Conv(
            self.hidden_units, (self.kernel_size,), padding="SAME",
            dtype=self.dtype,
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(d_model, dtype=self.dtype)(h)


def positionwise_layer_for(
    layer_type: str,
    hidden_units: int,
    dropout_rate: float,
    kernel_size: int = 3,
    activation: str = "relu",
    dtype=jnp.float32,
):
    """Factory keyed like the reference's positionwise_layer_type strings
    (transformer/encoder.py:141)."""
    if layer_type == "linear":
        return PositionwiseFeedForward(
            hidden_units, dropout_rate, activation, dtype=dtype
        )
    if layer_type == "conv1d":
        return MultiLayeredConv1d(
            hidden_units, kernel_size, dropout_rate, dtype=dtype
        )
    if layer_type == "conv1d-linear":
        return Conv1dLinear(hidden_units, kernel_size, dropout_rate, dtype=dtype)
    raise ValueError(f"unknown positionwise_layer_type {layer_type}")
