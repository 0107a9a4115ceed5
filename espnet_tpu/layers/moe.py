"""Mixture-of-experts feed-forward with expert parallelism — capability
beyond the reference (SURVEY §2.10: "expert … Absent").

Switch-style top-1 routing with a load-balance auxiliary loss
(Shazeer/Fedus switch transformer recipe). Experts' weights carry a
leading E axis; under a mesh, `expert_axis` shards that axis so each
device holds and computes only its experts (GSPMD partitions the
expert-contracted einsums; the gate's one-hot mask zeroes non-routed
token/expert pairs). The einsum formulation is dense over experts —
exact and simple; a capacity-based sorted dispatch is the next
optimization once models demand it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEFeedForward(nn.Module):
    n_experts: int = 4
    hidden_units: int = 1024
    dropout_rate: float = 0.1
    expert_axis: Optional[str] = None  # mesh axis to shard experts over
    aux_loss_weight: float = 0.01

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (B, T, D) → (y (B, T, D), aux_loss scalar)."""
        b, t, d = x.shape
        e, h = self.n_experts, self.hidden_units
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (e, d, h)
        )
        b1 = self.param("b1", nn.initializers.zeros, (e, h))
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (e, h, d)
        )
        b2 = self.param("b2", nn.initializers.zeros, (e, d))
        if self.expert_axis is not None:
            from jax.sharding import PartitionSpec as P

            cons = jax.lax.with_sharding_constraint
            w1 = cons(w1, P(self.expert_axis, None, None))
            b1 = cons(b1, P(self.expert_axis, None))
            w2 = cons(w2, P(self.expert_axis, None, None))
            b2 = cons(b2, P(self.expert_axis, None))

        logits = nn.Dense(e, name="router")(x)          # (B, T, E)
        probs = nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)                # (B, T)
        gate = jax.nn.one_hot(top, e, dtype=x.dtype)    # (B, T, E)
        # straight-through weight: route hard, scale by router prob
        scale = jnp.sum(gate * probs, axis=-1, keepdims=True)

        hdn = jnp.einsum("btd,edh->bteh", x, w1) + b1[None, None]
        hdn = nn.relu(hdn)
        hdn = nn.Dropout(self.dropout_rate)(hdn, deterministic=deterministic)
        out = jnp.einsum("bteh,ehd->bted", hdn, w2) + b2[None, None]
        y = jnp.einsum("bted,bte->btd", out, gate) * scale

        # switch load-balance loss: E · Σ_e fraction_e · mean_prob_e
        frac = gate.mean(axis=(0, 1))                   # (E,)
        mean_prob = probs.mean(axis=(0, 1))             # (E,)
        aux = self.aux_loss_weight * e * jnp.sum(frac * mean_prob)
        return y, aux
