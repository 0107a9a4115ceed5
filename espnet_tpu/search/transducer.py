"""Transducer decoding (reference: beam_search_transducer.py:34 —
greedy_search:130, default_beam_search:163).

Greedy is fully jittable: a lax.scan over T frames with a bounded
inner emit loop (max_symbols per frame). Default beam search runs
host-side over device-jitted step fns (hypothesis sets are inherently
ragged; the per-step math still runs on device), mirroring the
reference's algorithm including prefix recombination.

LM shallow fusion (reference beam_search_transducer.py:41,204-224,
316-337): every beam algorithm optionally takes an `LMFusion`; label
expansions add `lm_weight · log p_lm(label | history)`, blank
extensions carry the LM state unchanged. The batched device ALSD
threads the LM carry through the lax.scan exactly like the prediction
network's.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LMFusion(NamedTuple):
    """Shallow-fusion adapter: `init(n)` → LM state for n hypotheses;
    `step(state, tokens (N,))` → (new_state, next-token logp (N, V))."""

    init: Callable[[int], Any]
    step: Callable[[Any, jnp.ndarray], Tuple[Any, jnp.ndarray]]
    weight: float


def rnnlm_fusion(lm, lm_variables, weight: float) -> LMFusion:
    """Build an LMFusion from a SequentialRNNLM (models/lm/models.py)."""
    raw = jax.jit(lambda c, t: lm.apply(lm_variables, c, t, method="step"))

    def step(carry, tokens):
        carry, logits = raw(carry, tokens)
        return carry, jax.nn.log_softmax(logits, axis=-1)

    return LMFusion(lambda n: lm.init_carry(n), step, weight)


def transformerlm_fusion(lm, lm_variables, weight: float, max_len: int = 256) -> LMFusion:
    """TransformerLM fusion for the host algorithms: state = token
    history (python list); each step re-scores the padded prefix
    (score_prefix recompute — bounded recompiles via pow-2 padding)."""

    def pad_len(n):
        p = 8
        while p < n:
            p *= 2
        return min(p, max_len)

    score = jax.jit(
        lambda y, pos: lm.apply(lm_variables, y, pos, method="score_prefix")
    )

    def init(n):
        return [[] for _ in range(n)]

    def step(state, tokens):
        tokens = np.asarray(tokens)
        new_state, out = [], []
        for hist, tok in zip(state, tokens):
            hist = hist + [int(tok)]
            new_state.append(hist)
            L = pad_len(len(hist))
            y = np.zeros((1, L), np.int32)
            y[0, : len(hist)] = hist[-L:]
            out.append(np.asarray(score(jnp.asarray(y), len(hist) - 1))[0])
        return new_state, jnp.asarray(np.stack(out))

    return LMFusion(init, step, weight)


def _lm_expand(lmf: Optional[LMFusion], hyp: "_Hyp") -> Tuple[Any, Optional[np.ndarray]]:
    """Lazy per-expansion LM predict (reference :204): feed the hyp's
    last token (SOS=0 for the empty hyp) through its stored LM state."""
    if lmf is None:
        return None, None
    last = hyp.yseq[-1] if hyp.yseq else 0
    carry, logp = lmf.step(hyp.lm_carry, jnp.asarray([last], jnp.int32))
    return carry, np.asarray(logp)[0]


def transducer_greedy_decode(
    model,
    variables,
    hs: jnp.ndarray,      # (B, T, D) encoder output
    hlens: jnp.ndarray,
    max_symbols: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy (time-sync, ≤max_symbols emits per frame).

    Returns (ids (B, T*max_symbols) left-packed, lengths (B,))."""
    b, t, _ = hs.shape
    blank = model.blank

    carry0 = model.apply(variables, b, method="pred_init")
    token0 = jnp.zeros((b,), jnp.int32)
    _, g0 = model.apply(variables, carry0, token0, method="pred_step")

    def frame_step(state, inp):
        carry, g = state
        h_t, tidx = inp  # (B, D), scalar
        outs = []
        # once a row emits blank it stays blank for the rest of the frame
        # (stuck tracks it so later micro-steps are no-ops for that row;
        # the joint still computes batched — SIMD over the batch)
        stuck = jnp.zeros(h_t.shape[0], bool)
        for _ in range(max_symbols):
            logp = model.apply(variables, h_t, g, method="joint_step")  # (B,V)
            tok = jnp.argmax(logp, axis=-1)  # (B,)
            is_blank = (tok == blank) | (tidx >= hlens) | stuck
            stuck = is_blank
            new_carry, new_g = model.apply(variables, carry, tok, method="pred_step")
            carry = jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    is_blank.reshape((-1,) + (1,) * (n.ndim - 1)), o, n
                ),
                new_carry,
                carry,
            )
            g = jnp.where(is_blank[:, None], g, new_g)
            outs.append(jnp.where(is_blank, blank, tok))
        return (carry, g), jnp.stack(outs, axis=1)  # (B, max_symbols)

    (carry, g), toks = jax.lax.scan(
        frame_step,
        (carry0, g0),
        (jnp.transpose(hs, (1, 0, 2)), jnp.arange(t)),
    )
    toks = jnp.transpose(toks, (1, 0, 2)).reshape(b, t * max_symbols)
    keep = toks != blank
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(toks, order, axis=1)
    lens = keep.sum(axis=1)
    return packed, lens


@dataclasses.dataclass
class _Hyp:
    score: float
    yseq: Tuple[int, ...]
    carry: Any
    g: np.ndarray
    # LM state BEFORE consuming yseq[-1] (reference Hypothesis.lm_state
    # convention, beam_search_transducer.py:30): the last token is fed
    # lazily at expansion time.
    lm_carry: Any = None


def transducer_beam_decode(
    model,
    variables,
    hs: jnp.ndarray,     # (1, T, D) single utterance
    hlen: int,
    beam_size: int = 5,
    score_norm: bool = True,
    lm: Optional[LMFusion] = None,
    blank_penalty: float = 0.0,
) -> List[Tuple[List[int], float]]:
    """Default beam search (beam_search_transducer.py:163) for one
    utterance; returns n-best (ids, score). Optional LM shallow fusion
    (reference :204-224) and a blank log-prob penalty ablation knob."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    kept = [_Hyp(0.0, (), carry0, g0, lm.init(1) if lm else None)]
    beam_k = min(beam_size, model.vocab_size - 1)

    for t in range(int(hlen)):
        h_t = hs[:, t]  # (1, D)
        hyps = kept
        kept = []
        while len(kept) < beam_size:
            best = max(hyps, key=lambda h: h.score)
            hyps = [h for h in hyps if h is not best]
            logp = np.asarray(joint(h_t, best.g)[0])
            lm_carry, lm_logp = _lm_expand(lm, best)
            # blank: hypothesis survives to next frame
            kept_h = _Hyp(
                best.score + float(logp[blank]) - blank_penalty,
                best.yseq, best.carry, best.g, best.lm_carry,
            )
            # prefix recombination: merge identical label sequences
            merged = False
            for k in kept:
                if k.yseq == kept_h.yseq:
                    k.score = float(np.logaddexp(k.score, kept_h.score))
                    merged = True
                    break
            if not merged:
                kept.append(kept_h)
            # top-k non-blank expansions stay in the active set
            order = np.argsort(-logp)
            cnt = 0
            for v in order:
                if v == blank or cnt >= beam_k:
                    continue
                new_carry, new_g = pred(best.carry, jnp.array([v], jnp.int32))
                sc = best.score + float(logp[v])
                if lm is not None:
                    sc += lm.weight * float(lm_logp[v])
                hyps.append(
                    _Hyp(sc, best.yseq + (int(v),), new_carry, new_g, lm_carry)
                )
                cnt += 1
            if not hyps:
                break
    if score_norm:
        kept.sort(key=lambda h: h.score / max(len(h.yseq), 1), reverse=True)
    else:
        kept.sort(key=lambda h: h.score, reverse=True)
    return [(list(h.yseq), h.score) for h in kept]


def transducer_tsd_decode(
    model,
    variables,
    hs: jnp.ndarray,     # (1, T, D)
    hlen: int,
    beam_size: int = 5,
    max_sym_exp: int = 2,
    score_norm: bool = True,
    lm: Optional[LMFusion] = None,
) -> List[Tuple[List[int], float]]:
    """Time-synchronous decoding (beam_search_transducer.py:239): at each
    frame, up to max_sym_exp symbol expansions; hypotheses with the same
    label sequence are merged by logaddexp. LM fusion per :316-337."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0, lm.init(1) if lm else None)]

    for t in range(int(hlen)):
        h_t = hs[:, t]
        A: dict = {}  # yseq -> hyp (merged)
        C = B
        for _ in range(max_sym_exp):
            D: dict = {}
            for hyp in C:
                logp = np.asarray(joint(h_t, hyp.g)[0])
                lm_carry, lm_logp = _lm_expand(lm, hyp)
                # blank → goes to A (next frame)
                cand = _Hyp(
                    hyp.score + float(logp[blank]), hyp.yseq, hyp.carry,
                    hyp.g, hyp.lm_carry,
                )
                if cand.yseq in A:
                    A[cand.yseq].score = float(np.logaddexp(A[cand.yseq].score, cand.score))
                else:
                    A[cand.yseq] = cand
                # non-blank expansions continue within this frame
                order = np.argsort(-logp)[: beam_size + 1]
                for v in order:
                    if v == blank:
                        continue
                    new_carry, new_g = pred(hyp.carry, jnp.array([v], jnp.int32))
                    sc = hyp.score + float(logp[v])
                    if lm is not None:
                        sc += lm.weight * float(lm_logp[v])
                    nh = _Hyp(
                        sc, hyp.yseq + (int(v),), new_carry, new_g, lm_carry
                    )
                    if nh.yseq in D:
                        D[nh.yseq].score = float(np.logaddexp(D[nh.yseq].score, nh.score))
                    else:
                        D[nh.yseq] = nh
            C = sorted(D.values(), key=lambda h: h.score, reverse=True)[:beam_size]
        B = sorted(A.values(), key=lambda h: h.score, reverse=True)[:beam_size]

    key = (lambda h: h.score / max(len(h.yseq), 1)) if score_norm else (lambda h: h.score)
    B.sort(key=key, reverse=True)
    return [(list(h.yseq), h.score) for h in B]


def transducer_alsd_decode(
    model,
    variables,
    hs: jnp.ndarray,     # (1, T, D)
    hlen: int,
    beam_size: int = 5,
    u_max_ratio: float = 1.0,
    score_norm: bool = True,
    lm: Optional[LMFusion] = None,
    blank_penalty: float = 0.0,
) -> List[Tuple[List[int], float]]:
    """Align-length synchronous decoding (beam_search_transducer.py:349):
    hypotheses advance along n = t + u diagonals; final hyps harvested
    when t reaches T. LM fusion per reference :415-430."""
    blank = model.blank
    t_max = int(hlen)
    u_max = int(u_max_ratio * t_max)
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0, lm.init(1) if lm else None)]
    final: List[_Hyp] = []

    for n in range(t_max + u_max):
        A: dict = {}
        for hyp in B:
            u = len(hyp.yseq)
            t = n - u
            if t < 0 or t >= t_max:
                continue
            h_t = hs[:, t]
            logp = np.asarray(joint(h_t, hyp.g)[0])
            lm_carry, lm_logp = _lm_expand(lm, hyp)
            # blank advances t
            cand = _Hyp(
                hyp.score + float(logp[blank]) - blank_penalty,
                hyp.yseq, hyp.carry, hyp.g, hyp.lm_carry,
            )
            if t == t_max - 1:
                final.append(cand)
            if cand.yseq in A:
                A[cand.yseq].score = float(np.logaddexp(A[cand.yseq].score, cand.score))
            else:
                A[cand.yseq] = cand
            if u < u_max:
                order = np.argsort(-logp)[: beam_size + 1]
                for v in order:
                    if v == blank:
                        continue
                    new_carry, new_g = pred(hyp.carry, jnp.array([v], jnp.int32))
                    sc = hyp.score + float(logp[v])
                    if lm is not None:
                        sc += lm.weight * float(lm_logp[v])
                    nh = _Hyp(
                        sc, hyp.yseq + (int(v),), new_carry, new_g, lm_carry
                    )
                    if nh.yseq in A:
                        A[nh.yseq].score = float(np.logaddexp(A[nh.yseq].score, nh.score))
                    else:
                        A[nh.yseq] = nh
        if not A:
            break
        B = sorted(A.values(), key=lambda h: h.score, reverse=True)[:beam_size]

    pool = final if final else B
    key = (lambda h: h.score / max(len(h.yseq), 1)) if score_norm else (lambda h: h.score)
    pool.sort(key=key, reverse=True)
    return [(list(h.yseq), h.score) for h in pool[:beam_size]]


def transducer_nsc_decode(
    model,
    variables,
    hs: jnp.ndarray,     # (1, T, D)
    hlen: int,
    beam_size: int = 5,
    nstep: int = 2,
    score_norm: bool = True,
    lm: Optional[LMFusion] = None,
) -> List[Tuple[List[int], float]]:
    """N-step constrained beam search (beam_search_transducer.py:466,
    after Kim et al. 2020): per frame, at most `nstep` label expansions;
    only the top `beam_size` expansions survive each micro-step, blank
    extensions accumulate into the next frame's beam with logaddexp
    merging of identical prefixes. LM fusion per reference :556-576."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0, lm.init(1) if lm else None)]

    for t in range(int(hlen)):
        h_t = hs[:, t]
        next_frame: dict = {}
        cur = B
        for n in range(nstep):
            expansions = []
            for hyp in cur:
                logp = np.asarray(joint(h_t, hyp.g)[0])
                lm_carry, lm_logp = _lm_expand(lm, hyp)
                cand = _Hyp(
                    hyp.score + float(logp[blank]), hyp.yseq, hyp.carry,
                    hyp.g, hyp.lm_carry,
                )
                if cand.yseq in next_frame:
                    next_frame[cand.yseq].score = float(
                        np.logaddexp(next_frame[cand.yseq].score, cand.score)
                    )
                else:
                    next_frame[cand.yseq] = cand
                if n < nstep:
                    order = np.argsort(-logp)[: beam_size + 1]
                    for v in order:
                        if v == blank:
                            continue
                        sc = hyp.score + float(logp[v])
                        if lm is not None:
                            sc += lm.weight * float(lm_logp[v])
                        expansions.append((hyp, int(v), sc, lm_carry))
            if not expansions:
                break
            expansions.sort(key=lambda e: e[2], reverse=True)
            cur = []
            for hyp, v, sc, lm_carry in expansions[:beam_size]:
                new_carry, new_g = pred(hyp.carry, jnp.array([v], jnp.int32))
                cur.append(_Hyp(sc, hyp.yseq + (v,), new_carry, new_g, lm_carry))
        B = sorted(next_frame.values(), key=lambda h: h.score, reverse=True)[:beam_size]

    key = (lambda h: h.score / max(len(h.yseq), 1)) if score_norm else (lambda h: h.score)
    B.sort(key=key, reverse=True)
    return [(list(h.yseq), h.score) for h in B]


def transducer_alsd_decode_batch(
    model,
    variables,
    hs: jnp.ndarray,      # (B, T, D) encoder output
    hlens: jnp.ndarray,   # (B,)
    beam_size: int = 5,
    u_max_ratio: float = 1.0,
    score_norm: bool = True,
    lm: Optional[LMFusion] = None,
    blank_penalty: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched, fully jittable ALSD beam search — the TPU-first redesign
    of align_length_sync_decoding (beam_search_transducer.py:349).

    Optional LM shallow fusion: `lm` must be a jittable LMFusion (e.g.
    rnnlm_fusion) — its carry and cached next-token log-probs ride the
    lax.scan alongside the prediction-net state, so fusion adds one
    batched LM step per scan step and stays on device.

    All hypotheses advance along n = t + u diagonals with STATIC beam
    width: per step, one batched joint over (B, W) hyps, blank + top-W
    label candidates, exact logaddexp prefix recombination over the
    candidate pool (pairwise padded-yseq equality — W(W+1) candidates,
    O(C²·U) vector compares), top-W selection, and a fixed-size final
    set harvested when t reaches hlen. One jax.lax.scan over T+U steps;
    no host round-trips.

    Returns (yseq (B, W, U) blank-padded, ylens (B, W), scores (B, W))
    sorted best-first (score/len when score_norm, reference kept-sort
    convention).
    """
    b, t_max, _ = hs.shape
    w = beam_size
    u_max = max(int(u_max_ratio * t_max), 1)
    blank = model.blank
    neg = -1.0e30

    def pred_flat(carry, tokens):
        # carry leaves (B*W, ...), tokens (B*W,)
        return model.apply(variables, carry, tokens, method="pred_step")

    def joint_flat(h, g):
        return model.apply(variables, h, g, method="joint_step")

    carry0 = model.apply(variables, b * w, method="pred_init")
    _, g0 = pred_flat(carry0, jnp.zeros((b * w,), jnp.int32))
    if lm is not None:
        # lm_next caches log p_lm(· | hyp tokens); SOS = token 0
        lm_carry0, lm_next0 = lm.step(lm.init(b * w), jnp.zeros((b * w,), jnp.int32))
    else:
        lm_carry0, lm_next0 = (), jnp.zeros((b * w, 1))

    yseq0 = jnp.zeros((b, w, u_max), jnp.int32)
    ylen0 = jnp.zeros((b, w), jnp.int32)
    # only beam slot 0 starts alive (the reference's single empty hyp)
    score0 = jnp.where(jnp.arange(w)[None, :] == 0, 0.0, neg) * jnp.ones((b, 1))
    fin_score0 = jnp.full((b, w), neg)
    fin_yseq0 = jnp.zeros((b, w, u_max), jnp.int32)
    fin_ylen0 = jnp.zeros((b, w), jnp.int32)

    # label expansions per hyp: the host/reference pool is the top
    # (beam+1) of the FULL vocab with blank skipped — up to w+1 labels
    # when blank is outside the top set (beam_search_transducer.py:404)
    k = w + 1
    c = w * (k + 1)  # candidate pool size
    upos = jnp.arange(u_max)[None, None, :]

    def _merge_scores(scores, ylen, yseq):
        """Exact prefix recombination: logaddexp identical (ylen, yseq)
        candidates into the first occurrence, kill the rest."""
        same_len = ylen[:, :, None] == ylen[:, None, :]          # (B,C,C)
        same_seq = jnp.all(
            yseq[:, :, None, :] == yseq[:, None, :, :], axis=-1
        )
        alive = (scores > neg / 2)
        eq = same_len & same_seq & alive[:, :, None] & alive[:, None, :]
        # logsumexp over the row's duplicates
        dup_scores = jnp.where(eq, scores[:, None, :], neg)
        merged = jax.nn.logsumexp(dup_scores, axis=-1)
        idx = jnp.arange(c)
        first = ~jnp.any(eq & (idx[None, None, :] < idx[None, :, None]), axis=-1)
        return jnp.where(alive & first, merged, neg)

    def step(state, n):
        yseq, ylen, score, carry, g, lm_carry, lm_next, fin_s, fin_y, fin_l = state
        t = n - ylen  # (B, W)
        active = (score > neg / 2) & (t < hlens[:, None]) & (t >= 0)
        h_t = jnp.take_along_axis(
            hs, jnp.clip(t, 0, t_max - 1)[..., None], axis=1
        )  # (B, W, D) — take per (b, w)

        logp = joint_flat(
            h_t.reshape(b * w, -1), g
        ).reshape(b, w, -1)  # (B, W, V)

        # blank candidates: same labels, t advances (implicitly at n+1)
        sc_blank = jnp.where(active, score + logp[..., blank] - blank_penalty, neg)
        # label candidates: top-k non-blank; per-utterance label cap
        # u_max_i = ratio · hlen_i (reference beam_search_transducer.py:362)
        lab_scores, lab_ids = jax.lax.top_k(logp, k)  # (B, W, K) full vocab
        lab_scores = jnp.where(lab_ids == blank, neg, lab_scores)
        if lm is not None:
            # shallow fusion on the decoder's top-k candidates
            # (reference order: top_k by raw ytu, then += lm_weight·lm,
            # beam_search_transducer.py:415-430)
            lm_lab = jnp.take_along_axis(
                lm_next.reshape(b, w, -1), lab_ids, axis=-1
            )
            lab_scores = lab_scores + lm.weight * lm_lab
        u_cap = jnp.minimum(
            (u_max_ratio * hlens).astype(jnp.int32), u_max
        )
        can_extend = active & (ylen < u_cap[:, None])
        sc_lab = jnp.where(can_extend[..., None], score[..., None] + lab_scores, neg)

        # pool: parent w, kind 0=blank else label j-1
        pool_scores = jnp.concatenate(
            [sc_blank[..., None], sc_lab], axis=2
        ).reshape(b, c)
        parent = jnp.broadcast_to(
            jnp.arange(w)[None, :, None], (b, w, k + 1)
        ).reshape(b, c)
        kind = jnp.broadcast_to(
            jnp.arange(k + 1)[None, None, :], (b, w, k + 1)
        ).reshape(b, c)
        lab_full = jnp.concatenate(
            [jnp.zeros((b, w, 1), jnp.int32), lab_ids], axis=2
        ).reshape(b, c)

        par_yseq = jnp.take_along_axis(yseq, parent[..., None], axis=1)  # (B,C,U)
        par_ylen = jnp.take_along_axis(ylen, parent, axis=1)
        is_lab = kind > 0
        cand_ylen = par_ylen + is_lab.astype(jnp.int32)
        cand_yseq = jnp.where(
            (upos == par_ylen[..., None]) & is_lab[..., None],
            lab_full[..., None],
            par_yseq,
        )

        merged = _merge_scores(pool_scores, cand_ylen, cand_yseq)

        # harvest finals: blank candidates whose frame was the last
        par_t = jnp.take_along_axis(t, parent, axis=1)
        is_final = (kind == 0) & (par_t == hlens[:, None] - 1) & (merged > neg / 2)
        fin_cand = jnp.where(is_final, merged, neg)
        # merge final candidates + existing finals, keep top W — ranked
        # by the FINAL ranking key (score/len under score_norm): the
        # host keeps every final (beam_search_transducer.py:432) and
        # only ranks at the end, so retention by raw score here would
        # evict long hypotheses that win after length normalization
        all_fs = jnp.concatenate([fin_s, fin_cand], axis=1)          # (B, W+C)
        all_fy = jnp.concatenate([fin_y, cand_yseq], axis=1)
        all_fl = jnp.concatenate([fin_l, cand_ylen], axis=1)
        all_rank = all_fs / jnp.maximum(all_fl, 1) if score_norm else all_fs
        all_rank = jnp.where(all_fs > neg / 2, all_rank, neg)
        _, fi = jax.lax.top_k(all_rank, w)
        fin_s = jnp.take_along_axis(all_fs, fi, axis=1)
        fin_y = jnp.take_along_axis(all_fy, fi[..., None], axis=1)
        fin_l = jnp.take_along_axis(all_fl, fi, axis=1)

        # top-W beam selection
        sel_scores, sel = jax.lax.top_k(merged, w)  # (B, W)
        sel_parent = jnp.take_along_axis(parent, sel, axis=1)
        sel_kind = jnp.take_along_axis(kind, sel, axis=1)
        sel_label = jnp.take_along_axis(lab_full, sel, axis=1)
        new_yseq = jnp.take_along_axis(cand_yseq, sel[..., None], axis=1)
        new_ylen = jnp.take_along_axis(cand_ylen, sel, axis=1)

        # pred-net state: gather parent state, step for label-extends
        flat_par = (jnp.arange(b)[:, None] * w + sel_parent).reshape(-1)
        par_carry = jax.tree_util.tree_map(lambda x: x[flat_par], carry)
        par_g = g[flat_par]
        new_carry, new_g = pred_flat(par_carry, sel_label.reshape(-1))
        ext = (sel_kind > 0).reshape(-1)
        carry = jax.tree_util.tree_map(
            lambda nw, old: jnp.where(
                ext.reshape((-1,) + (1,) * (nw.ndim - 1)), nw, old
            ),
            new_carry,
            par_carry,
        )
        g = jnp.where(ext[:, None], new_g, par_g)

        if lm is not None:
            # LM state rides the beam exactly like the pred net's
            par_lmc = jax.tree_util.tree_map(lambda x: x[flat_par], lm_carry)
            par_lmn = lm_next[flat_par]
            new_lmc, new_lmn = lm.step(par_lmc, sel_label.reshape(-1))
            lm_carry = jax.tree_util.tree_map(
                lambda nw, old: jnp.where(
                    ext.reshape((-1,) + (1,) * (nw.ndim - 1)), nw, old
                ),
                new_lmc,
                par_lmc,
            )
            lm_next = jnp.where(ext[:, None], new_lmn, par_lmn)

        return (
            new_yseq, new_ylen, sel_scores, carry, g, lm_carry, lm_next,
            fin_s, fin_y, fin_l,
        ), None

    state0 = (
        yseq0, ylen0, score0, carry0, g0, lm_carry0, lm_next0,
        fin_score0, fin_yseq0, fin_ylen0,
    )
    state, _ = jax.lax.scan(step, state0, jnp.arange(t_max + u_max))
    yseq, ylen, score, _, _, _, _, fin_s, fin_y, fin_l = state

    # pool = finals if any else live beam (reference fallback)
    have_final = jnp.any(fin_s > neg / 2, axis=1, keepdims=True)
    pool_s = jnp.where(have_final, fin_s, score)
    pool_y = jnp.where(have_final[..., None], fin_y, yseq)
    pool_l = jnp.where(have_final, fin_l, ylen)
    rank = pool_s / jnp.maximum(pool_l, 1) if score_norm else pool_s
    rank = jnp.where(pool_s > neg / 2, rank, neg)
    order = jnp.argsort(-rank, axis=1)
    return (
        jnp.take_along_axis(pool_y, order[..., None], axis=1),
        jnp.take_along_axis(pool_l, order, axis=1),
        jnp.take_along_axis(pool_s, order, axis=1),
    )
