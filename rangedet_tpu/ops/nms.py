"""On-device (weighted) NMS — TPU-native replacement of the reference's
host-side C++ WNMS ``processing_cxx.wnms_4c`` (operator_cxx/src_cxx/nms.h:452-577)
and the CUDA ``mx.sym.contrib.NMS3D`` (operator_cxx/contrib/nms_3d.cu:380-534).

The reference runs inference on GPU, syncs every frame to the host, and runs a
sequential greedy weighted-NMS in C++ — the per-frame host round-trip is its
throughput bottleneck (tools/test.py:176-234). Here the greedy sweep runs as
an early-exiting ``lax.while_loop`` over score-sorted candidates — serially,
or (default) in exact blocks of ``block`` candidates whose IoU rows batch
into one matmul-friendly pass — entirely on device, so decode → NMS → final
boxes is one fused XLA program.

Weighted-NMS semantics replicated from wnms_4c:
  * candidates processed in descending score order;
  * the top survivor suppresses every remaining candidate with IoU ≥ thresh
    (0.1) and collects *voters*: itself plus remaining candidates with
    IoU > thresh_vote (0.5);
  * voters whose yaw deviates from the voters' median yaw by ≥ 0.3 rad
    (mod 2π, nms.h:541-545) are rejected; the median uses the reference's
    tie-break: ≤ 2 voters → survivor's yaw; an even count inserts the
    survivor's yaw before taking the middle element (nms.h:531-540);
  * the output row is the score-weighted average of the voters' 11-dim
    geometry [8 corners, yaw, bottom, height], plus the survivor's score.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .rotated_iou import iou_bev_corners

YAW_REJECT = 0.3
TWO_PI = 2.0 * 3.1415926  # matches the constant in nms.h:542


def _det_iou(dets11: jnp.ndarray, one: jnp.ndarray, iou_3d: bool) -> jnp.ndarray:
    """IoU of one 11-dim det against all: (K, 11), (11,) -> (K,)."""
    corners = dets11[:, :8].reshape(-1, 4, 2)
    one_c = one[:8].reshape(4, 2)
    bev = iou_bev_corners(one_c[None], corners)
    if not iou_3d:
        return bev
    # volumetric IoU with z extents [bottom, bottom + height] (nms.h:172-184)
    from .boxes import polygon_area

    a0, h0 = one[9], one[10]
    a1, h1 = dets11[:, 9], dets11[:, 10]
    z_ov = jnp.maximum(0.0, jnp.minimum(a0 + h0, a1 + h1) - jnp.maximum(a0, a1))
    s_one = jnp.abs(polygon_area(one_c))
    s_all = jnp.abs(polygon_area(corners))
    inter_bev = bev * (s_one + s_all) / (1.0 + bev)  # recover inter from IoU
    inter = inter_bev * z_ov
    union = s_one * h0 + s_all * h1 - inter
    return inter / jnp.maximum(union, 1e-8)


def _median_yaw_presorted(
    voters_sorted: jnp.ndarray,
    yaw_sorted: jnp.ndarray,
    yaw_i: jnp.ndarray,
) -> jnp.ndarray:
    """Median voter yaw with the reference's tie-breaks (nms.h:527-540).

    Takes the voter mask and yaws permuted into ascending-yaw order: the yaws
    never change across greedy rounds, so the sort happens ONCE outside the
    NMS loop and each round's median is a cumsum + masked select (a per-round
    jnp.sort over the candidate axis was the inference bottleneck — lax.sort
    is pathologically slow on small TPU axes).
    """
    c = jnp.cumsum(voters_sorted.astype(jnp.int32))
    n = c[-1]

    def pick(rank):  # 0-based rank among voters, in yaw order
        sel = voters_sorted & (c == rank + 1)
        return jnp.sum(jnp.where(sel, yaw_sorted, 0.0))

    odd_median = pick(n // 2)
    # even count: conceptually insert yaw_i into the sorted list, take n/2
    t = jnp.sum(voters_sorted & (yaw_sorted < yaw_i))
    k = n // 2
    even_median = jnp.where(
        k < t, pick(k), jnp.where(k == t, yaw_i, pick(k - 1))
    )
    median = jnp.where(n % 2 == 1, odd_median, even_median)
    return jnp.where(n <= 2, yaw_i, median)


def weighted_nms(
    dets11: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    thresh_vote: float,
    max_keep: int,
    iou_3d: bool = False,
    prefilter_topm: int = 0,
    block: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted NMS over 11-dim dets.

    Args:
      dets11: (K, 11) [8 corners, yaw, bottom, height].
      scores: (K,) confidence scores.
      valid: (K,) bool candidate validity.
      thresh: suppression IoU threshold (reference thr_lo, e.g. 0.1).
      thresh_vote: voting IoU threshold (reference thr_hi, e.g. 0.5).
      max_keep: static number of greedy rounds (post-NMS top-n).
      iou_3d: use volumetric IoU (reference is_3d_iou; shipped configs False).
      prefilter_topm: if > 0, each round runs the exact polygon clip only
        against candidates whose circumcircles overlap the survivor's (IoU is
        provably 0 outside that set) — the device analogue of the reference's
        spatial-hash prefilter (operator_cxx/src_cxx/nms.h:252-307 BBoxHash).
        The overlapping set is processed in chunks of ``prefilter_topm``
        nearest-first until exhausted, so the result is EXACT unconditionally:
        the common case (≤ topm circumcircle collisions) costs one chunk, a
        crowded round simply runs extra chunks instead of approximating.
      block: if > 0, run the greedy sweep in BLOCKS of this many candidates:
        each outer round selects the next ``block`` alive candidates in score
        order with ONE top_k and computes their exact IoU rows as one
        vectorized (block, K) batch, then resolves the greedy dependency
        chain serially in-block with cheap masked vector ops. Exact — the
        IoU row of a candidate is independent of the suppression state, and
        any candidate positioned between two block members was already dead
        at selection time, so emitting still-alive block members in order
        replicates the serial sweep. Suppression at thr 0.1 is aggressive,
        so a block typically spans several distinct objects and emits
        several survivors per outer round, amortising the per-round
        top_k/gather machinery that dominates the serial form on TPU.
        Mutually exclusive with prefilter_topm (block rows are full rows).

    Returns:
      out12: (max_keep, 12) weighted boxes [avg 11-dim, survivor score].
      out_valid: (max_keep,) bool row validity.
    """
    K = dets11.shape[0]
    dets11 = dets11.astype(jnp.float32)
    scores = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)

    order = jnp.argsort(-scores)
    dets11 = dets11[order]
    scores = scores[order]
    valid = valid[order]
    yaw = dets11[:, 8]
    arange = jnp.arange(K)
    # yaw-ascending permutation, computed once for the per-round median
    yaw_order = jnp.argsort(yaw)
    yaw_sorted = yaw[yaw_order]

    corners = dets11[:, :8].reshape(K, 4, 2)
    centers = jnp.mean(corners, axis=1)  # (K, 2)
    radii = jnp.sqrt(
        jnp.max(jnp.sum((corners - centers[:, None]) ** 2, axis=-1), axis=-1)
    )  # (K,) circumradius around the corner centroid
    M = min(prefilter_topm, K) if prefilter_topm else 0
    if block and prefilter_topm:
        raise ValueError(
            "weighted_nms: block and prefilter_topm are mutually exclusive — "
            "the blocked sweep computes full IoU rows, so a prefilter_topm "
            "would silently have no effect (pass prefilter_topm=0 with block)"
        )

    if block:
        B = min(block, K)

        def blk_cond(state):
            suppressed, rows, row_valid, r = state
            return (r < max_keep) & jnp.any(valid & ~suppressed)

        def blk_body(state):
            suppressed, rows, row_valid, r = state
            # next B alive candidates in score order: ONE top_k for the
            # whole block (the serial form pays one selection per round)
            alive0 = valid & ~suppressed
            key = jnp.where(alive0, arange, K)
            neg_key, sub = jax.lax.top_k(-key, B)  # key ascending
            sub_ok = neg_key > -K  # member was alive at selection time
            # exact IoU rows for the whole block, one vectorized batch
            iou_blk = jax.vmap(
                lambda j: _det_iou(dets11, dets11[j], iou_3d)
            )(sub)  # (B, K)

            # Pass 1 — resolve the in-block greedy chain with TINY ops only
            # (the old form ran the full O(K) voting/median body serially for
            # every member, even ones killed in-block): a member survives iff
            # alive at selection and not killed by an earlier in-block
            # survivor; kill masks accumulate over the unrolled chain.
            # (Every candidate positioned between two block members was
            # already dead at selection time, so this replicates serial
            # greedy — same argument as before.)
            kill = jnp.zeros((K,), bool)
            surv_l, alive_at_l = [], []
            for b in range(B):
                alive_b = alive0 & ~kill  # (K,) alive when member b emits
                alive_at_l.append(alive_b)
                s_b = sub_ok[b] & alive_b[sub[b]]
                surv_l.append(s_b)
                kill = kill | (
                    s_b & ((iou_blk[b] >= thresh) | (arange == sub[b]))
                )
            surv = jnp.stack(surv_l)          # (B,)
            alive_at = jnp.stack(alive_at_l)  # (B, K)

            # Pass 2 — the expensive voting/median/average work for the
            # whole block as ONE batched (B, K) pass instead of B serial
            # O(K) bodies; non-survivors' rows are computed but dropped.
            def vote(b):
                pos = sub[b]
                iou_row = iou_blk[b]
                voters = (
                    alive_at[b] & (iou_row > thresh_vote)
                ) | (arange == pos)
                median = _median_yaw_presorted(
                    voters[yaw_order], yaw_sorted, yaw[pos]
                )
                yaw_ok = jnp.mod(jnp.abs(yaw - median), TWO_PI) < YAW_REJECT
                w = jnp.where(voters & yaw_ok, jnp.maximum(scores, 0.0), 0.0)
                wsum = jnp.maximum(jnp.sum(w), 1e-12)
                avg11 = jnp.sum(w[:, None] * dets11, axis=0) / wsum
                return jnp.concatenate([avg11, scores[pos][None]])

            blk_rows = jax.vmap(vote)(jnp.arange(B))  # (B, 12)

            # emit surviving rows at their greedy ranks; slots past max_keep
            # (or non-survivors, parked at slot max_keep) drop out-of-bounds
            ranks = r + jnp.cumsum(surv.astype(jnp.int32)) - 1
            slot = jnp.where(surv, ranks, max_keep)
            rows = rows.at[slot].set(blk_rows, mode="drop")
            row_valid = row_valid.at[slot].set(True, mode="drop")
            suppressed = suppressed | kill
            r = jnp.minimum(r + jnp.sum(surv.astype(jnp.int32)), max_keep)
            return suppressed, rows, row_valid, r

        init = (
            ~valid,
            jnp.zeros((max_keep, 12), jnp.float32),
            jnp.zeros((max_keep,), bool),
            jnp.asarray(0, jnp.int32),
        )
        _, rows, row_valid, _ = jax.lax.while_loop(blk_cond, blk_body, init)
        return rows, row_valid

    def iou_row_of(one, idx):
        if not M:
            return _det_iou(dets11, one, iou_3d)
        c_i = jnp.mean(one[:8].reshape(4, 2), axis=0)
        r_i = jnp.sqrt(jnp.max(jnp.sum((one[:8].reshape(4, 2) - c_i) ** 2, -1)))
        d2 = jnp.sum((centers - c_i) ** 2, axis=-1)
        maybe = d2 < (radii + r_i) ** 2  # IoU > 0 certified impossible outside

        # Exact chunked sweep: pick the M nearest unprocessed collisions per
        # chunk (lax.top_k by negative distance — measured faster than a
        # cumsum stream-compaction on v5e) until none remain. ≥ 1 collision
        # always exists (the survivor itself), and the usual frame fits in
        # one chunk, so the loop body runs once in the common case.
        def chunk_cond(st):
            _, remaining = st
            return jnp.any(remaining)

        def chunk_body(st):
            row, remaining = st
            key = jnp.where(remaining, d2, jnp.inf)
            _, sub = jax.lax.top_k(-key, M)
            picked = remaining[sub]  # top_k pads with non-remaining when < M
            sub_iou = _det_iou(dets11[sub], one, iou_3d)
            row = row.at[sub].set(jnp.where(picked, sub_iou, row[sub]))
            remaining = remaining.at[sub].set(False)
            return row, remaining

        row, _ = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.zeros((K,), jnp.float32), maybe)
        )
        return row

    def cond_fn(state):
        suppressed, rows, row_valid, r = state
        # early exit: frames rarely fill max_keep — each round costs a full
        # IoU row, so stop as soon as no candidate remains alive
        return (r < max_keep) & jnp.any(valid & ~suppressed)

    def body_fn(state):
        suppressed, rows, row_valid, r = state
        alive = valid & ~suppressed
        idx = jnp.argmax(alive)  # first alive in score order
        one = dets11[idx]
        score_i = scores[idx]
        yaw_i = yaw[idx]

        iou_row = iou_row_of(one, idx)
        voters = (alive & (iou_row > thresh_vote)) | (arange == idx)

        median = _median_yaw_presorted(voters[yaw_order], yaw_sorted, yaw_i)
        yaw_ok = jnp.mod(jnp.abs(yaw - median), TWO_PI) < YAW_REJECT
        w = jnp.where(voters & yaw_ok, jnp.maximum(scores, 0.0), 0.0)

        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        avg11 = jnp.sum(w[:, None] * dets11, axis=0) / wsum
        row = jnp.concatenate([avg11, score_i[None]])

        rows = rows.at[r].set(row)
        row_valid = row_valid.at[r].set(True)
        suppressed = suppressed | (alive & (iou_row >= thresh)) | (arange == idx)
        return suppressed, rows, row_valid, r + 1

    init = (
        ~valid,
        jnp.zeros((max_keep, 12), jnp.float32),
        jnp.zeros((max_keep,), bool),
        jnp.asarray(0, jnp.int32),
    )
    _, rows, row_valid, _ = jax.lax.while_loop(cond_fn, body_fn, init)
    return rows, row_valid


def nms_3d(
    boxes10: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    max_keep: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Classic greedy NMS over box10 dets — equivalent of contrib.NMS3D
    (nms_3d.cu:380-534, only used when config wnms=False).

    Returns (keep_boxes (max_keep, 10), keep_idx (max_keep,), valid (max_keep,));
    keep_idx refers to positions in the *input* order.
    """
    K = boxes10.shape[0]
    scores = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-scores)
    boxes10 = boxes10[order]
    svalid = valid[order]
    corners = boxes10[:, :8].reshape(-1, 4, 2)
    arange = jnp.arange(K)

    def round_fn(suppressed, _):
        alive = svalid & ~suppressed
        has_any = jnp.any(alive)
        idx = jnp.argmax(alive)
        iou_row = iou_bev_corners(corners[idx][None], corners)
        new_suppressed = (
            suppressed | (alive & (iou_row >= iou_thresh)) | (arange == idx)
        )
        new_suppressed = jnp.where(has_any, new_suppressed, suppressed)
        return new_suppressed, (boxes10[idx], order[idx], has_any)

    _, (kept, keep_idx, row_valid) = jax.lax.scan(
        round_fn, ~svalid, None, length=max_keep
    )
    kept = jnp.where(row_valid[:, None], kept, 0.0)
    keep_idx = jnp.where(row_valid, keep_idx, -1)
    return kept, keep_idx, row_valid
