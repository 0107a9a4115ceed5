"""Joint enhancement + ASR model (reference:
espnet2/asr/espnet_joint_model.py:30 ESPnetEnhASRModel,
espnet2/tasks/enh_asr.py).

mixture → separator (PIT SI-SNR vs speech refs) → separated streams
reordered by the winning permutation so stream i lines up with
text_ref i → streams folded into the batch dim → shared ASR model
(frontend + encoder + CTC/attention) → loss =
(1-enh_weight)·asr + enh_weight·enh, exactly the reference mixing
(espnet_joint_model.py:293-298).

TPU notes: the permutation realignment is a gather with a static
(P, S) inverse-permutation table (no host round trip), and the
(B, n_spk) stream fold keeps every ASR tensor at a static shape.
"""
from __future__ import annotations

import itertools
from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espnet_tpu.models.enh.models import pit_loss
from espnet_tpu.utils.masks import make_non_pad_mask


class EnhASRModel(nn.Module):
    separator: nn.Module
    asr: nn.Module
    n_spk: int = 2
    enh_weight: float = 0.5

    def __call__(
        self,
        speech_mix: jnp.ndarray,  # (B, N)
        speech_mix_lengths: jnp.ndarray,  # (B,)
        speech_ref: jnp.ndarray,  # (B, n_spk, N)
        text_ref: jnp.ndarray,  # (B, n_spk, U), -1 padded
        text_ref_lengths: jnp.ndarray,  # (B, n_spk)
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        b = speech_mix.shape[0]
        ests, _ = self.separator(speech_mix, speech_mix_lengths)
        n = min(ests[0].shape[-1], speech_ref.shape[-1])
        mask = make_non_pad_mask(speech_mix_lengths, n).astype(ests[0].dtype)
        ests = [e[:, :n] * mask for e in ests]
        refs = [speech_ref[:, i, :n] * mask for i in range(self.n_spk)]
        loss_enh_b, perm = pit_loss(ests, refs)
        loss_enh = loss_enh_b.mean()

        # realign: pit perm p means est[i] was scored against ref[p[i]];
        # put each est at its matched ref slot via the inverse perm
        perms = jnp.asarray(
            list(itertools.permutations(range(self.n_spk))), dtype=jnp.int32
        )  # (P, S)
        inv = jnp.argsort(perms, axis=1)  # (P, S): inv[p][ref_slot] = est idx
        sel = inv[perm]  # (B, S)
        est_stack = jnp.stack(ests, axis=1)  # (B, S, N)
        est_aligned = jnp.take_along_axis(est_stack, sel[:, :, None], axis=1)

        # fold speakers into the batch for one shared-ASR pass
        flat_speech = est_aligned.reshape(b * self.n_spk, n)
        flat_slens = jnp.repeat(
            jnp.minimum(speech_mix_lengths, n), self.n_spk, axis=0
        )
        flat_text = text_ref.reshape(b * self.n_spk, -1)
        flat_tlens = text_ref_lengths.reshape(b * self.n_spk)
        loss_asr, stats_asr = self.asr(
            flat_speech, flat_slens, flat_text, flat_tlens,
            deterministic=deterministic,
        )

        if self.enh_weight == 0.0:
            loss = loss_asr
        else:
            loss = (1.0 - self.enh_weight) * loss_asr + self.enh_weight * loss_enh
        stats = {f"asr_{k}": v for k, v in stats_asr.items()}
        stats.update(
            {"loss": loss, "loss_enh": loss_enh, "si_snr": -loss_enh,
             "loss_asr": loss_asr}
        )
        return loss, stats

    def separate(self, speech_mix, lengths):
        return self.separator(speech_mix, lengths)
