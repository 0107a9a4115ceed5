"""ASR inference: Speech2Text (reference: espnet2/bin/asr_inference.py:37).

Builds the scorer set {attention decoder, CTC, LM, length bonus} from a
trained model, runs the batched jittable beam search (or greedy CTC),
and converts ids → tokens → text.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.search.beam_search import BeamSearch
from espnet_tpu.search.greedy import ctc_greedy_decode_host
from espnet_tpu.search.scorers import (
    rnn_decoder_scorer,
    rnn_lm_scorer,
    transformer_lm_cached_scorer,
    transformer_decoder_cached_scorer,
    transformer_decoder_scorer,
    transformer_lm_scorer,
)

logger = logging.getLogger(__name__)


class Speech2Text:
    """model + params → callable: speech batch → n-best texts."""

    def __init__(
        self,
        model,
        variables,
        token_list: List[str],
        decoder=None,
        beam_size: int = 10,
        ctc_weight: float = 0.3,
        lm=None,
        lm_variables=None,
        lm_weight: float = 0.0,
        ngram_arpa=None,
        ngram_weight: float = 0.0,
        penalty: float = 0.0,
        maxlenratio: float = 0.0,
        minlenratio: float = 0.0,
        nbest: int = 1,
        space_symbol: str = "<space>",
        stop_criterion: str = "dominance",
    ):
        self.model = model
        self.variables = variables
        self.token_list = token_list
        self.nbest = nbest
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.maxlenratio = maxlenratio
        self.minlenratio = minlenratio
        self.space = space_symbol
        vocab = model.vocab_size
        self.sos = self.eos = vocab - 1

        scorers = {}
        dec = decoder if decoder is not None else model.decoder
        if dec is not None and ctc_weight < 1.0:
            dec_vars = {"params": variables["params"]["decoder"]}
            from espnet_tpu.models.asr.rnn_decoder import RNNDecoder

            if isinstance(dec, RNNDecoder):
                scorers["decoder"] = rnn_decoder_scorer(dec, dec_vars, 1.0 - ctc_weight)
            elif getattr(dec, "selfattn_layer_type", "selfattn") != "selfattn":
                # conv-attention decoders have no KV cache — decode via
                # the stateless full-prefix path (score_prefix)
                scorers["decoder"] = transformer_decoder_scorer(
                    dec, dec_vars, 1.0 - ctc_weight
                )
            else:
                # KV-cached fast path (verified identical to the
                # stateless score_prefix path)
                scorers["decoder"] = transformer_decoder_cached_scorer(
                    dec, dec_vars, 1.0 - ctc_weight
                )
        if ngram_arpa and ngram_weight > 0:
            from espnet_tpu.text.ngram import ArpaLM, ngram_full_scorer

            scorers["ngram"] = ngram_full_scorer(
                ArpaLM.load(ngram_arpa), token_list, ngram_weight
            )
        if lm is not None and lm_weight > 0:
            from espnet_tpu.models.lm.models import SequentialRNNLM

            if isinstance(lm, SequentialRNNLM):
                scorers["lm"] = rnn_lm_scorer(lm, lm_variables, lm_weight)
            else:
                # KV-cached incremental scoring: one token's FLOPs per
                # beam step (the stateless transformer_lm_scorer
                # recomputes the whole prefix each step)
                scorers["lm"] = transformer_lm_cached_scorer(
                    lm, lm_variables, lm_weight
                )

        self.pure_ctc = not scorers
        if not self.pure_ctc:
            self.beam_search = BeamSearch(
                scorers,
                vocab_size=vocab,
                sos=self.sos,
                eos=self.eos,
                beam_size=beam_size,
                ctc_weight=ctc_weight,
                length_bonus=penalty,
                stop_criterion=stop_criterion,
            )
            # weights of every scorer, threaded through jit as ARGUMENTS
            # — closure-captured params serialize into the compile
            # payload (compile-time bloat on any TPU; HTTP 413 under a
            # remote-compile tunnel at d>=512 scale)
            from espnet_tpu.search.beam_search import _NO_PARAMS

            self._scorer_params = {
                k: s.params
                for k, s in scorers.items()
                if s.params is not _NO_PARAMS
            }
            self._search = jax.jit(
                lambda sp, hs, hlens, ctc_logp, maxlen, minlen: self.beam_search(
                    hs,
                    hlens,
                    ctc_logp=ctc_logp,
                    maxlen=maxlen,
                    minlen=minlen,
                    return_finished=True,
                    scorer_params=sp,
                ),
                static_argnames=("maxlen", "minlen"),
            )
        # model weights as jit arguments too (same payload rationale)
        self._encode = jax.jit(
            lambda v, speech, lens: model.apply(v, speech, lens, method="encode")
        )
        self._ctc_logp = jax.jit(
            lambda v, hs: model.apply(v, hs, method="ctc_log_softmax")
        )

    def __call__(
        self, speech: np.ndarray, lengths: Optional[np.ndarray] = None
    ) -> List[List[Tuple[str, List[str], List[int], float]]]:
        """speech: (B, ...) raw wave or features. Returns per-utterance
        n-best list of (text, tokens, token_ids, score)."""
        speech = jnp.asarray(speech)
        if lengths is None:
            lengths = np.full(speech.shape[0], speech.shape[1], dtype=np.int32)
        lengths = jnp.asarray(lengths)
        hs, hlens = self._encode(self.variables, speech, lengths)

        if self.pure_ctc:
            logp = self._ctc_logp(self.variables, hs)
            hyps = ctc_greedy_decode_host(np.asarray(logp), np.asarray(hlens))
            return [
                [self._ids_to_result(h, 0.0)] for h in hyps
            ]

        ctc_logp = (
            self._ctc_logp(self.variables, hs) if self.ctc_weight > 0 else None
        )
        t_enc = int(np.asarray(hlens).max())
        maxlen = (
            max(1, int(self.maxlenratio * t_enc)) if self.maxlenratio > 0 else t_enc
        )
        minlen = int(self.minlenratio * t_enc)
        yseq, ylen, scores, finished = self._search(
            self._scorer_params, hs, hlens, ctc_logp, maxlen, minlen
        )
        yseq, ylen, scores, finished = (
            np.array(x) for x in (yseq, ylen, scores, finished)
        )  # np.array: writable copies (the retry merge assigns rows)
        # reference retry semantics (beam_search.py:387-391): when an
        # utterance produced no eos-ended hypothesis, re-run with
        # minlenratio reduced by 0.1 steps. Where the reference finally
        # returns [] (ratio < 0.1), we keep the forced-close fallback
        # hypotheses instead of emitting nothing.
        ratio = self.minlenratio
        while not finished.all() and ratio >= 0.1 and minlen > 0:
            ratio = max(0.0, ratio - 0.1)
            minlen = int(ratio * t_enc)
            logger.warning(
                "%d utt(s) had no finished hypothesis; retrying with "
                "minlenratio %.1f", int((~finished).sum()), ratio,
            )
            y2, l2, s2, f2 = map(np.asarray, self._search(
                self._scorer_params, hs, hlens, ctc_logp, maxlen, minlen
            ))
            redo = ~finished
            yseq[redo], ylen[redo], scores[redo] = y2[redo], l2[redo], s2[redo]
            finished = finished | f2
        results = []
        for b in range(yseq.shape[0]):
            nb = []
            for k in range(min(self.nbest, yseq.shape[1])):
                ids = [int(x) for x in yseq[b, k, 1: ylen[b, k] - 1]]
                nb.append(self._ids_to_result(ids, float(scores[b, k])))
            results.append(nb)
        return results

    def _ids_to_result(self, ids: Sequence[int], score: float):
        tokens = [
            self.token_list[i]
            for i in ids
            if 0 <= i < len(self.token_list)
        ]
        text = "".join(" " if t == self.space else t for t in tokens)
        if any("▁" in t for t in tokens):  # bpe word mark
            text = "".join(tokens).replace("▁", " ").strip()
        return (text, tokens, list(ids), score)
