"""CTC output head (reference: espnet/nets/pytorch_backend/ctc.py:12).

A single projection to vocab plus the scan/Pallas CTC loss; exposes
log_softmax/argmax/forced-align used by decoding and alignment tools.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from espnet_tpu.losses.ctc import ctc_forced_align, ctc_loss


class CTCHead(nn.Module):
    vocab_size: int
    dropout_rate: float = 0.0
    # None = auto: Pallas kernel on TPU, lax.scan elsewhere
    use_pallas: Optional[bool] = None
    # projection compute dtype; log-softmax always upcasts to f32
    dtype: type = jnp.float32

    def setup(self):
        self.ctc_lo = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def _nll(self, logp, ys, hlens, ylens):
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from espnet_tpu.losses.pallas_ctc import ctc_loss_pallas

            return ctc_loss_pallas(logp, ys, hlens, ylens, 0, False)
        return ctc_loss(logp, ys, hlens, ylens)

    def __call__(
        self,
        hs: jnp.ndarray,
        hlens: jnp.ndarray,
        ys: jnp.ndarray,
        ylens: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Mean-over-batch CTC loss (reference ctc.py:53-60 semantics:
        reduction='sum' ÷ batch)."""
        hs = self.dropout(hs, deterministic=deterministic)
        logp = nn.log_softmax(self.ctc_lo(hs).astype(jnp.float32), axis=-1)
        nll = self._nll(logp, ys, hlens, ylens)
        return nll.sum() / hs.shape[0]

    def log_softmax(self, hs: jnp.ndarray) -> jnp.ndarray:
        return nn.log_softmax(self.ctc_lo(hs).astype(jnp.float32), axis=-1)

    def argmax(self, hs: jnp.ndarray) -> jnp.ndarray:
        return jnp.argmax(self.log_softmax(hs), axis=-1)

    def forced_align(
        self, hs: jnp.ndarray, hlens: jnp.ndarray, ys: jnp.ndarray, ylens: jnp.ndarray
    ) -> jnp.ndarray:
        return ctc_forced_align(self.log_softmax(hs), ys, hlens, ylens)
