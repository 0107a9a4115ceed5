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
