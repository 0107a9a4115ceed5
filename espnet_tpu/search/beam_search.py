"""Batched, jittable joint CTC/attention beam search.

Redesign of the reference's BeamSearch/BatchBeamSearch
(espnet/nets/pytorch_backend/beam_search.py:36, batch_beam_search.py:31)
for XLA: fixed beam width, static yseq buffers, an alive/finished
double-beam (the TPU-standard formulation), one batched score call per
step for all hypotheses, pre-beam top-K gating of the CTC partial scorer
(:303-310), and state reindexing by gather after pruning. The whole
search runs as a single lax.while_loop under jit — usable on device,
inside pjit, and across hosts with sharded batches.

Scorer protocol (≙ ScorerInterface/BatchScorerInterface
scorer_interface.py:11,85): a FullScorer owns
    init(params, memory, memory_lens, maxlen) -> state   (leading dim N = B*W)
    score(params, state, yseq, pos) -> (logp (N, V), new_state)
where `params` is the scorer's weight pytree, threaded through the
search as data (NOT a closure capture): callers jit the whole search
with the per-scorer params as ARGUMENTS, so weights never serialize
into the compiled program as constants (captured constants bloat the
compile payload and, under a remote-compile tunnel, can exceed request
limits at d>=512 scale). Legacy scorers built without a `params` field
keep the old closure-capture signatures init(mem, lens, maxlen) /
score(state, yseq, pos) and still work.
States are pytrees; pruning gathers them by flat hypothesis index.
The CTC prefix scorer (PartialScorer) is handled natively via
espnet_tpu.search.ctc_prefix.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from espnet_tpu.search.ctc_prefix import (
    CTCPrefixState,
    ctc_prefix_init,
    ctc_prefix_score,
    ctc_prefix_select,
)

NEG_INF = -1.0e10

# Sentinel marking a scorer built with the legacy closure-capture
# protocol (init/score take no leading params argument).
_NO_PARAMS = object()


@dataclasses.dataclass
class FullScorer:
    """A label-synchronous scorer producing (N, V) log-probs per step.

    Params-threaded protocol (preferred — lets callers pass weights as
    jit arguments instead of baked-in constants):
        init(params, memory (N,T,D), memory_lens (N,), maxlen) -> state
        score(params, state, yseq (N,L), pos (N,)) -> (logp (N,V), new_state)
    with `params` defaulting to the pytree stored in `self.params`.

    Legacy protocol (params left at the _NO_PARAMS sentinel):
        init(memory, memory_lens, maxlen) -> state
        score(state, yseq, pos) -> (logp, new_state)
    """

    weight: float
    init: Callable[..., Any]
    score: Callable[..., Tuple[jnp.ndarray, Any]]
    params: Any = _NO_PARAMS

    def call_init(self, params, mem, mem_lens, maxlen):
        if params is _NO_PARAMS:
            return self.init(mem, mem_lens, maxlen)
        return self.init(params, mem, mem_lens, maxlen)

    def call_score(self, params, state, yseq, pos):
        if params is _NO_PARAMS:
            return self.score(state, yseq, pos)
        return self.score(params, state, yseq, pos)


class BeamState(NamedTuple):
    step: jnp.ndarray
    yseq: jnp.ndarray            # (B, W, L)
    ylen: jnp.ndarray            # (B, W)
    scores: jnp.ndarray          # (B, W) accumulated weighted scores
    scorer_states: Dict[str, Any]
    ctc_state: Optional[CTCPrefixState]
    fin_yseq: jnp.ndarray        # (B, W, L)
    fin_ylen: jnp.ndarray
    fin_scores: jnp.ndarray      # (B, W)
    # end_detect mode only: best newly-finished score of each of the
    # last M steps (B, M); NEG_INF = no hyp ended at that length
    fin_recent: Optional[jnp.ndarray] = None


def _gather_tree(tree: Any, idx: jnp.ndarray) -> Any:
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


class BeamSearch:
    def __init__(
        self,
        full_scorers: Dict[str, FullScorer],
        vocab_size: int,
        sos: int,
        eos: int,
        beam_size: int = 10,
        ctc_weight: float = 0.0,
        pre_beam_size: Optional[int] = None,
        length_bonus: float = 0.0,
        blank: int = 0,
        stop_criterion: str = "dominance",
        end_detect_m: int = 3,
        end_detect_d: float = -10.0,
    ):
        self.full_scorers = full_scorers
        self.vocab_size = vocab_size
        self.sos = sos
        self.eos = eos
        self.beam = beam_size
        self.ctc_weight = ctc_weight
        self.pre_beam = min(
            pre_beam_size or int(1.5 * beam_size), vocab_size
        )
        self.length_bonus = length_bonus
        self.blank = blank
        # "dominance" (default): stop when no alive hyp can beat the
        # worst finished one. "end_detect": the reference's Eq.(50) rule
        # (e2e_asr_common.py:21) — stop once the best hyp ended at each
        # of the last M lengths trails the global best by more than
        # |D_end|; lengths with no ended hyp block the stop.
        if stop_criterion not in ("dominance", "end_detect"):
            raise ValueError(f"unknown stop_criterion: {stop_criterion}")
        self.stop_criterion = stop_criterion
        self.end_detect_m = end_detect_m
        self.end_detect_d = end_detect_d

    # -- main entry ----------------------------------------------------
    def __call__(
        self,
        memory: jnp.ndarray,       # (B, T, D) encoder output
        memory_lens: jnp.ndarray,  # (B,)
        ctc_logp: Optional[jnp.ndarray] = None,  # (B, T, V)
        maxlen: Optional[int] = None,
        minlen: int = 0,
        return_finished: bool = False,
        scorer_params: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """Run search. Returns (yseq (B, W, L), ylens (B, W), scores (B, W))
        sorted best-first, eos-terminated, sos at position 0. With
        return_finished=True, appends a (B,) bool mask: True where the
        entry produced at least one properly eos-ended hypothesis
        (False = forced close; reference retries with lower minlenratio,
        beam_search.py:387-391).

        scorer_params: optional {name: pytree} overriding each scorer's
        stored params — pass THIS through a jit boundary so weights are
        arguments of the compiled search, not captured constants."""
        b, t_enc, _ = memory.shape
        w = self.beam
        n = b * w
        if maxlen is None:
            maxlen = t_enc
        l = maxlen + 2  # sos + tokens + eos

        # tile memory to (N, T, D)
        mem_t = jnp.repeat(memory, w, axis=0)
        mem_lens_t = jnp.repeat(memory_lens, w, axis=0)

        # resolve per-scorer params: explicit override > stored pytree >
        # legacy sentinel (closure-captured weights)
        params = {
            k: (scorer_params[k] if scorer_params and k in scorer_params
                else s.params)
            for k, s in self.full_scorers.items()
        }
        scorer_states = {
            k: s.call_init(params[k], mem_t, mem_lens_t, l)
            for k, s in self.full_scorers.items()
        }
        ctc_state = None
        ctc_logp_t = None
        ctc_lens_t = None
        if ctc_logp is not None and self.ctc_weight > 0:
            ctc_logp_t = jnp.repeat(ctc_logp, w, axis=0)
            ctc_lens_t = mem_lens_t
            ctc_state = ctc_prefix_init(ctc_logp_t, ctc_lens_t, self.blank)

        yseq = jnp.full((b, w, l), self.eos, dtype=jnp.int32)
        yseq = yseq.at[:, :, 0].set(self.sos)
        # only beam 0 is live initially (identical hyps would duplicate)
        init_scores = jnp.full((b, w), NEG_INF)
        init_scores = init_scores.at[:, 0].set(0.0)

        state = BeamState(
            step=jnp.zeros((), jnp.int32),
            yseq=yseq,
            ylen=jnp.ones((b, w), jnp.int32),
            scores=init_scores,
            scorer_states=scorer_states,
            ctc_state=ctc_state,
            fin_yseq=yseq,
            fin_ylen=jnp.ones((b, w), jnp.int32),
            fin_scores=jnp.full((b, w), NEG_INF),
            fin_recent=(
                jnp.full((b, self.end_detect_m), NEG_INF)
                if self.stop_criterion == "end_detect"
                else None
            ),
        )

        def cond(st: BeamState):
            if self.stop_criterion == "end_detect":
                # reference end_detect: all of the last M lengths have
                # ended hyps AND each trails the global best by > |D|
                best = st.fin_scores.max(axis=1)
                exists = st.fin_recent > NEG_INF / 2
                bad = (st.fin_recent - best[:, None]) < self.end_detect_d
                ended = (exists & bad).all(axis=1)  # (B,)
                return (st.step < maxlen + 1) & ~ended.all()
            # dominance (default): continue while under maxlen (+1 final
            # eos-only harvest step) and some alive hyp could still beat
            # the worst finished one
            alive_best = st.scores.max(axis=1)
            fin_worst = st.fin_scores.min(axis=1)
            improvable = (alive_best + self.length_bonus * maxlen >= fin_worst).any()
            return (st.step < maxlen + 1) & improvable

        def body(st: BeamState):
            return self._step(
                st, params, mem_t, mem_lens_t, ctc_logp_t, ctc_lens_t,
                b, w, l, minlen, maxlen,
            )

        state = jax.lax.while_loop(cond, body, state)

        # merge any still-alive hyps as forcibly-ended candidates
        has_fin = (state.fin_scores > NEG_INF / 2).any(axis=1)
        state = self._finalize(state, b, w, l)
        order = jnp.argsort(-state.fin_scores, axis=1)
        fin_yseq = jnp.take_along_axis(state.fin_yseq, order[..., None], axis=1)
        fin_ylen = jnp.take_along_axis(state.fin_ylen, order, axis=1)
        fin_scores = jnp.take_along_axis(state.fin_scores, order, axis=1)
        if return_finished:
            return fin_yseq, fin_ylen, fin_scores, has_fin
        return fin_yseq, fin_ylen, fin_scores

    # -- one step ------------------------------------------------------
    def _step(self, st, params, mem_t, mem_lens_t, ctc_logp_t, ctc_lens_t, b, w, l, minlen, maxlen):
        n = b * w
        v = self.vocab_size
        yseq_flat = st.yseq.reshape(n, l)
        pos = st.ylen.reshape(n) - 1  # index of last token

        # 1. full scorers — one batched call each
        weighted = jnp.zeros((n, v))
        new_scorer_states = {}
        for name, scorer in self.full_scorers.items():
            logp, new_s = scorer.call_score(
                params[name], st.scorer_states[name], yseq_flat, pos
            )
            weighted = weighted + scorer.weight * logp
            new_scorer_states[name] = new_s
        weighted = weighted + self.length_bonus  # token insertion bonus

        # blank never proposed in attention beam
        weighted = weighted.at[:, self.blank].set(NEG_INF)

        # 2. pre-beam top-K gates the CTC partial scorer
        k = self.pre_beam
        pre_scores, cand_ids = jax.lax.top_k(weighted, k)  # (N, K)

        total_cand = st.scores.reshape(n)[:, None] + pre_scores
        new_ctc_cand = None
        if st.ctc_state is not None:
            ctc_sc, new_ctc_cand = ctc_prefix_score(
                st.ctc_state, ctc_logp_t, ctc_lens_t, cand_ids, self.eos, self.blank
            )
            total_cand = total_cand + self.ctc_weight * ctc_sc

        # 3. mask: dead beams propose nothing; eos before minlen forbidden
        alive = st.scores.reshape(n) > NEG_INF / 2
        total_cand = jnp.where(alive[:, None], total_cand, NEG_INF)
        is_eos = cand_ids == self.eos
        too_short = (st.ylen.reshape(n) - 1) < minlen
        total_cand = jnp.where(is_eos & too_short[:, None], NEG_INF, total_cand)
        # hyps at maxlen may only propose eos (final harvest step)
        at_max = (st.ylen.reshape(n) - 1) >= maxlen
        total_cand = jnp.where(at_max[:, None] & ~is_eos, NEG_INF, total_cand)

        cand_b = total_cand.reshape(b, w * k)
        ids_b = cand_ids.reshape(b, w * k)
        eos_b = is_eos.reshape(b, w * k)

        # 4. finished pool: eos candidates merge with existing finished
        fin_cand = jnp.where(eos_b, cand_b, NEG_INF)  # (B, W*K)
        all_fin_scores = jnp.concatenate([st.fin_scores, fin_cand], axis=1)
        # yseq of a finishing hyp = current yseq + eos at pos+1
        hyp_of_cand = jnp.arange(w * k) // k  # (W*K,) local hyp index
        fin_top, fin_idx = jax.lax.top_k(all_fin_scores, w)  # (B, W)
        from_old = fin_idx < w

        def pick_fin(old, new_src):
            return jnp.where(from_old[..., None], old, new_src)

        cand_hyp = hyp_of_cand[jnp.clip(fin_idx - w, 0, w * k - 1)]  # (B, W)
        cand_yseq = jnp.take_along_axis(
            st.yseq, cand_hyp[..., None], axis=1
        )  # (B, W, L)
        cand_len = jnp.take_along_axis(st.ylen, cand_hyp, axis=1)  # (B, W)
        # append eos at position cand_len
        app = jax.nn.one_hot(cand_len, l, dtype=jnp.bool_)
        cand_yseq = jnp.where(app, self.eos, cand_yseq)
        old_fin_yseq = st.fin_yseq
        fin_yseq = pick_fin(
            jnp.take_along_axis(old_fin_yseq, jnp.clip(fin_idx, 0, w - 1)[..., None], axis=1),
            cand_yseq,
        )
        fin_ylen = jnp.where(
            from_old,
            jnp.take_along_axis(st.fin_ylen, jnp.clip(fin_idx, 0, w - 1), axis=1),
            cand_len + 1,
        )

        # 5. alive beam: non-eos candidates compete for W slots
        alive_cand = jnp.where(eos_b, NEG_INF, cand_b)
        alive_top, alive_idx = jax.lax.top_k(alive_cand, w)  # (B, W)
        sel_hyp = hyp_of_cand[alive_idx]                      # (B, W) local
        sel_tok = jnp.take_along_axis(ids_b, alive_idx, axis=1)

        new_yseq = jnp.take_along_axis(st.yseq, sel_hyp[..., None], axis=1)
        new_ylen = jnp.take_along_axis(st.ylen, sel_hyp, axis=1)
        app = jax.nn.one_hot(new_ylen, l, dtype=jnp.bool_)
        new_yseq = jnp.where(app, sel_tok[..., None], new_yseq)
        new_ylen = new_ylen + 1

        # flat gather index for scorer states
        flat_hyp = (jnp.arange(b)[:, None] * w + sel_hyp).reshape(-1)  # (N,)
        new_scorer_states = {
            name: _gather_tree(s, flat_hyp)
            for name, s in new_scorer_states.items()
        }
        new_ctc_state = None
        if new_ctc_cand is not None:
            sel_cand_flat = (alive_idx % k).reshape(-1)  # (N,) candidate slot
            new_ctc_state = ctc_prefix_select(
                new_ctc_cand, flat_hyp, sel_cand_flat
            )

        fin_recent = st.fin_recent
        if fin_recent is not None:  # end_detect bookkeeping
            best_new_fin = fin_cand.max(axis=1)  # (B,) this step's length
            fin_recent = jnp.concatenate(
                [fin_recent[:, 1:], best_new_fin[:, None]], axis=1
            )

        return BeamState(
            step=st.step + 1,
            yseq=new_yseq,
            ylen=new_ylen,
            scores=alive_top,
            scorer_states=new_scorer_states,
            ctc_state=new_ctc_state,
            fin_yseq=fin_yseq,
            fin_ylen=fin_ylen,
            fin_scores=fin_top,
            fin_recent=fin_recent,
        )

    def _finalize(self, st: BeamState, b, w, l) -> BeamState:
        """Fallback: if a batch entry has NO finished hypothesis (all eos
        proposals lost), force-close its alive hyps. Entries with finished
        hyps are untouched — forced closes lack the eos score and must not
        outrank proper finishes."""
        app = jax.nn.one_hot(st.ylen, l, dtype=jnp.bool_)
        closed_yseq = jnp.where(app, self.eos, st.yseq)
        closed_len = st.ylen + 1
        has_fin = (st.fin_scores > NEG_INF / 2).any(axis=1, keepdims=True)
        forced_scores = jnp.where(has_fin, NEG_INF, st.scores)
        all_scores = jnp.concatenate([st.fin_scores, forced_scores], axis=1)
        all_yseq = jnp.concatenate([st.fin_yseq, closed_yseq], axis=1)
        all_len = jnp.concatenate([st.fin_ylen, closed_len], axis=1)
        top, idx = jax.lax.top_k(all_scores, w)
        return st._replace(
            fin_scores=top,
            fin_yseq=jnp.take_along_axis(all_yseq, idx[..., None], axis=1),
            fin_ylen=jnp.take_along_axis(all_len, idx, axis=1),
        )
