"""Transducer decoding (reference: beam_search_transducer.py:34 —
greedy_search:130, default_beam_search:163).

Greedy is fully jittable: a lax.scan over T frames with a bounded
inner emit loop (max_symbols per frame). Default beam search runs
host-side over device-jitted step fns (hypothesis sets are inherently
ragged; the per-step math still runs on device), mirroring the
reference's algorithm including prefix recombination.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


def transducer_beam_decode(
    model,
    variables,
    hs: jnp.ndarray,     # (1, T, D) single utterance
    hlen: int,
    beam_size: int = 5,
    score_norm: bool = True,
) -> List[Tuple[List[int], float]]:
    """Default beam search (beam_search_transducer.py:163) for one
    utterance; returns n-best (ids, score)."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    kept = [_Hyp(0.0, (), carry0, g0)]
    beam_k = min(beam_size, model.vocab_size - 1)

    for t in range(int(hlen)):
        h_t = hs[:, t]  # (1, D)
        hyps = kept
        kept = []
        while len(kept) < beam_size:
            best = max(hyps, key=lambda h: h.score)
            hyps = [h for h in hyps if h is not best]
            logp = np.asarray(joint(h_t, best.g)[0])
            # blank: hypothesis survives to next frame
            kept_h = _Hyp(
                best.score + float(logp[blank]), best.yseq, best.carry, best.g
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
                hyps.append(
                    _Hyp(
                        best.score + float(logp[v]),
                        best.yseq + (int(v),),
                        new_carry,
                        new_g,
                    )
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
) -> List[Tuple[List[int], float]]:
    """Time-synchronous decoding (beam_search_transducer.py:239): at each
    frame, up to max_sym_exp symbol expansions; hypotheses with the same
    label sequence are merged by logaddexp."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0)]

    for t in range(int(hlen)):
        h_t = hs[:, t]
        A: dict = {}  # yseq -> hyp (merged)
        C = B
        for _ in range(max_sym_exp):
            D: dict = {}
            for hyp in C:
                logp = np.asarray(joint(h_t, hyp.g)[0])
                # blank → goes to A (next frame)
                cand = _Hyp(hyp.score + float(logp[blank]), hyp.yseq, hyp.carry, hyp.g)
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
                    nh = _Hyp(
                        hyp.score + float(logp[v]),
                        hyp.yseq + (int(v),),
                        new_carry,
                        new_g,
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
) -> List[Tuple[List[int], float]]:
    """Align-length synchronous decoding (beam_search_transducer.py:349):
    hypotheses advance along n = t + u diagonals; final hyps harvested
    when t reaches T."""
    blank = model.blank
    t_max = int(hlen)
    u_max = int(u_max_ratio * t_max)
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0)]
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
            # blank advances t
            cand = _Hyp(hyp.score + float(logp[blank]), hyp.yseq, hyp.carry, hyp.g)
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
                    nh = _Hyp(
                        hyp.score + float(logp[v]),
                        hyp.yseq + (int(v),),
                        new_carry,
                        new_g,
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
) -> List[Tuple[List[int], float]]:
    """N-step constrained beam search (beam_search_transducer.py:466,
    after Kim et al. 2020): per frame, at most `nstep` label expansions;
    only the top `beam_size` expansions survive each micro-step, blank
    extensions accumulate into the next frame's beam with logaddexp
    merging of identical prefixes."""
    blank = model.blank
    joint = jax.jit(lambda h, g: model.apply(variables, h, g, method="joint_step"))
    pred = jax.jit(lambda c, t: model.apply(variables, c, t, method="pred_step"))

    carry0 = model.apply(variables, 1, method="pred_init")
    _, g0 = pred(carry0, jnp.zeros((1,), jnp.int32))
    B = [_Hyp(0.0, (), carry0, g0)]

    for t in range(int(hlen)):
        h_t = hs[:, t]
        next_frame: dict = {}
        cur = B
        for n in range(nstep):
            expansions = []
            for hyp in cur:
                logp = np.asarray(joint(h_t, hyp.g)[0])
                cand = _Hyp(hyp.score + float(logp[blank]), hyp.yseq, hyp.carry, hyp.g)
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
                        expansions.append((hyp, int(v), hyp.score + float(logp[v])))
            if not expansions:
                break
            expansions.sort(key=lambda e: e[2], reverse=True)
            cur = []
            for hyp, v, sc in expansions[:beam_size]:
                new_carry, new_g = pred(hyp.carry, jnp.array([v], jnp.int32))
                cur.append(_Hyp(sc, hyp.yseq + (v,), new_carry, new_g))
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched, fully jittable ALSD beam search — the TPU-first redesign
    of align_length_sync_decoding (beam_search_transducer.py:349).

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

    yseq0 = jnp.zeros((b, w, u_max), jnp.int32)
    ylen0 = jnp.zeros((b, w), jnp.int32)
    # only beam slot 0 starts alive (the reference's single empty hyp)
    score0 = jnp.where(jnp.arange(w)[None, :] == 0, 0.0, neg) * jnp.ones((b, 1))
    fin_score0 = jnp.full((b, w), neg)
    fin_yseq0 = jnp.zeros((b, w, u_max), jnp.int32)
    fin_ylen0 = jnp.zeros((b, w), jnp.int32)

    k = w  # label expansions per hyp
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
        yseq, ylen, score, carry, g, fin_s, fin_y, fin_l = state
        t = n - ylen  # (B, W)
        active = (score > neg / 2) & (t < hlens[:, None]) & (t >= 0)
        h_t = jnp.take_along_axis(
            hs, jnp.clip(t, 0, t_max - 1)[..., None], axis=1
        )  # (B, W, D) — take per (b, w)

        logp = joint_flat(
            h_t.reshape(b * w, -1), g
        ).reshape(b, w, -1)  # (B, W, V)

        # blank candidates: same labels, t advances (implicitly at n+1)
        sc_blank = jnp.where(active, score + logp[..., blank], neg)  # (B,W)
        # label candidates: top-k non-blank; per-utterance label cap
        # u_max_i = ratio · hlen_i (reference beam_search_transducer.py:362)
        lp_lab = logp.at[..., blank].set(neg)
        lab_scores, lab_ids = jax.lax.top_k(lp_lab, k)  # (B, W, K)
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
        # merge final candidates + existing finals, recombine, keep top W
        all_fs = jnp.concatenate([fin_s, fin_cand], axis=1)          # (B, W+C)
        all_fy = jnp.concatenate([fin_y, cand_yseq], axis=1)
        all_fl = jnp.concatenate([fin_l, cand_ylen], axis=1)
        fs_top, fi = jax.lax.top_k(all_fs, w)
        fin_s = fs_top
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

        return (new_yseq, new_ylen, sel_scores, carry, g, fin_s, fin_y, fin_l), None

    state0 = (yseq0, ylen0, score0, carry0, g0, fin_score0, fin_yseq0, fin_ylen0)
    state, _ = jax.lax.scan(step, state0, jnp.arange(t_max + u_max))
    yseq, ylen, score, _, _, fin_s, fin_y, fin_l = state

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
