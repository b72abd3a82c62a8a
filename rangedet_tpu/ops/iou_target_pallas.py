"""Fused IoU-target Pallas kernel: per-pixel box decode + max rotated-BEV-IoU
against a per-block GT candidate list, vectorized over 16×128-pixel tiles.

This is the training hot spot (RangeRpnHead.get_iou_target, reference
rangedet/symbol/head/builder.py:156-196 — a dense CUDA (297k × 200) polygon
clip). Design:

  * pixels are processed in tiles of 2048 (16 sublanes × 128 lanes); every
    per-pixel scalar (corner coordinates, clip parameters) is one VPU tile;
  * a tile of 2048 *contiguous* range-image pixels spans a narrow azimuth
    sector, so its pixels share GT candidates: XLA precomputes, per block, the
    G nearest GT boxes by (min over the block's decoded centers of center
    distance) — a (num_blocks × M) problem instead of (pixels × M) — and the
    kernel streams those G quads from SMEM as scalars;
  * the clip is the Green's-theorem / Liang–Barsky formulation
    (ops/rotated_iou.quad_intersection_area) with the GT quad scalar —
    order-free, sort-free, ~550 VPU ops per (tile, GT);
  * decode needs no transcendentals: cos/sin of azimuth are x/r, y/r, and the
    predicted (cos, sin) pair is normalized and angle-added directly.

The IoU target is stop-gradient, so no custom VJP is needed. The XLA chunked
path (max_iou_vs_gt) is the numerical oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .boxes import polygon_area

EPS = 1e-8
TILE_S, TILE_L = 16, 128
TILE = TILE_S * TILE_L


def _green_inter_scalar_gt(ax, ay, gx, gy):
    """Intersection area of per-pixel CCW quads A (lists of 4 tiles) with a
    scalar CCW quad G (lists of 4 scalars)."""

    def pieces_a_in_g():
        # parts of A's edges inside G (G scalar): f[j][i] = cross(e_j, A_i-G_j)
        ex = [gx[(j + 1) % 4] - gx[j] for j in range(4)]
        ey = [gy[(j + 1) % 4] - gy[j] for j in range(4)]
        f = [
            [ex[j] * (ay[i] - gy[j]) - ey[j] * (ax[i] - gx[j]) for i in range(4)]
            for j in range(4)
        ]
        total = 0.0
        for i in range(4):
            i1 = (i + 1) % 4
            t0 = jnp.zeros_like(ax[0])
            t1 = jnp.ones_like(ax[0])
            empty = jnp.zeros_like(ax[0], dtype=jnp.bool_)
            for j in range(4):
                f0, f1 = f[j][i], f[j][i1]
                denom = f0 - f1
                t_star = f0 / jnp.where(jnp.abs(denom) > EPS, denom, 1.0)
                empty = empty | ((f0 < 0) & (f1 < 0))
                t0 = jnp.maximum(t0, jnp.where((f0 < 0) & (f1 >= 0), t_star, 0.0))
                t1 = jnp.minimum(t1, jnp.where((f0 >= 0) & (f1 < 0), t_star, 1.0))
            empty = empty | (t1 <= t0)
            dx = ax[i1] - ax[i]
            dy = ay[i1] - ay[i]
            s0x = ax[i] + t0 * dx
            s0y = ay[i] + t0 * dy
            s1x = ax[i] + t1 * dx
            s1y = ay[i] + t1 * dy
            total = total + jnp.where(empty, 0.0, s0x * s1y - s0y * s1x)
        return total

    def pieces_g_in_a():
        # parts of G's edges (scalar endpoints) inside per-pixel quad A
        ex = [ax[(i + 1) % 4] - ax[i] for i in range(4)]
        ey = [ay[(i + 1) % 4] - ay[i] for i in range(4)]
        f = [
            [ex[i] * (gy[j] - ay[i]) - ey[i] * (gx[j] - ax[i]) for j in range(4)]
            for i in range(4)
        ]
        total = 0.0
        for j in range(4):
            j1 = (j + 1) % 4
            t0 = jnp.zeros_like(ax[0])
            t1 = jnp.ones_like(ax[0])
            empty = jnp.zeros_like(ax[0], dtype=jnp.bool_)
            for i in range(4):
                f0, f1 = f[i][j], f[i][j1]
                denom = f0 - f1
                t_star = f0 / jnp.where(jnp.abs(denom) > EPS, denom, 1.0)
                empty = empty | ((f0 < 0) & (f1 < 0))
                t0 = jnp.maximum(t0, jnp.where((f0 < 0) & (f1 >= 0), t_star, 0.0))
                t1 = jnp.minimum(t1, jnp.where((f0 >= 0) & (f1 < 0), t_star, 1.0))
            empty = empty | (t1 <= t0)
            dx = gx[j1] - gx[j]
            dy = gy[j1] - gy[j]
            s0x = gx[j] + t0 * dx
            s0y = gy[j] + t0 * dy
            s1x = gx[j] + t1 * dx
            s1y = gy[j] + t1 * dy
            total = total + jnp.where(empty, 0.0, s0x * s1y - s0y * s1x)
        return total

    return jnp.maximum(pieces_a_in_g() + pieces_g_in_a(), 0.0) * 0.5


def _kernel(cand_ref, nv_ref, delta_ref, pc_ref, out_ref, *, G, mode):
    blk = pl.program_id(0)
    d = delta_ref[0]  # (8, 16, 128)
    pcx, pcy = pc_ref[0, 0], pc_ref[0, 1]

    r = jnp.sqrt(pcx * pcx + pcy * pcy)
    safe_r = jnp.where(r > EPS, r, 1.0)
    cos_a = jnp.where(r > EPS, pcx / safe_r, 1.0)
    sin_a = jnp.where(r > EPS, pcy / safe_r, 0.0)

    dx = d[0] * jnp.abs(d[0])
    dy = d[1] * jnp.abs(d[1])
    width = jnp.exp(d[2])
    length = jnp.exp(d[3])
    cx = pcx + dx * cos_a - dy * sin_a
    cy = pcy + dx * sin_a + dy * cos_a

    n = jnp.sqrt(d[4] * d[4] + d[5] * d[5])
    safe_n = jnp.where(n > EPS, n, 1.0)
    cos_rel = jnp.where(n > EPS, d[4] / safe_n, 1.0)
    sin_rel = jnp.where(n > EPS, d[5] / safe_n, 0.0)
    cyw = cos_rel * cos_a - sin_rel * sin_a
    sy = sin_rel * cos_a + cos_rel * sin_a
    hl, hw = 0.5 * length, 0.5 * width

    # CCW corners: D(+l,+w) C(-l,+w) B(-l,-w) A(+l,-w)
    lx = [hl, -hl, -hl, hl]
    wy = [hw, hw, -hw, -hw]
    ax = [lx[i] * cyw - wy[i] * sy + cx for i in range(4)]
    ay = [lx[i] * sy + wy[i] * cyw + cy for i in range(4)]
    sa = length * width

    def body(g, iou_max):
        base = g * 9
        gx = [cand_ref[blk, base + 2 * i] for i in range(4)]
        gy = [cand_ref[blk, base + 2 * i + 1] for i in range(4)]
        sb = cand_ref[blk, base + 8]
        inter = _green_inter_scalar_gt(ax, ay, gx, gy)
        one = inter / jnp.maximum(sa + sb - inter, EPS)
        one = jnp.where((sa < EPS) | (sb < EPS), 0.0, one)
        return jnp.maximum(iou_max, one)

    # candidates are clearance-ordered (ascending); nv counts those that can
    # possibly overlap any pixel of this block (clearance <= 0), so skipped
    # candidates provably contribute IoU 0. Skip strategies:
    #   none  — static G-trip loop (no skip; nv unused)
    #   dyn   — dynamic nv-trip loop (minimal work, but the data-dependent
    #           bound costs Mosaic its static unroll/pipelining)
    #   gate  — static G-trip loop, whole block skipped when nv == 0
    #   gate8 — dynamic ceil(nv/8)-trip loop over an 8-unrolled body (the
    #           overshoot candidates are real clearance-ordered GT rows or
    #           zero-area padding, so extra iterations are exact no-ops)
    zero = jnp.zeros((TILE_S, TILE_L), jnp.float32)

    def finish(iou):
        iou = jnp.where(jnp.isfinite(iou), iou, 0.0)
        return jnp.where((iou < 0.0) | (iou > 1.0), 0.0, iou)

    if mode == "none":
        out_ref[0] = finish(jax.lax.fori_loop(0, G, body, zero))
    elif mode == "dyn":
        out_ref[0] = finish(jax.lax.fori_loop(0, nv_ref[blk], body, zero))
    elif mode == "gate":
        out_ref[0] = zero

        @pl.when(nv_ref[blk] > 0)
        def _():
            out_ref[0] = finish(jax.lax.fori_loop(0, G, body, zero))

    elif mode == "gate8":
        assert G % 8 == 0, "gate8 needs the candidate table padded to 8"

        def body8(t, iou_max):
            for k in range(8):
                iou_max = body(t * 8 + k, iou_max)
            return iou_max

        nv8 = (nv_ref[blk] + 7) // 8
        out_ref[0] = finish(jax.lax.fori_loop(0, nv8, body8, zero))
    else:  # pragma: no cover
        raise ValueError(f"unknown skip mode {mode!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def iou_target_fused(
    deltas: jnp.ndarray,
    pc: jnp.ndarray,
    gt_corners: jnp.ndarray,
    topk_gt: int = 32,
    interpret: bool = False,
    skip_far="gate8",
) -> jnp.ndarray:
    """deltas (B, H, W, 8), pc (B, H, W, 3), gt_corners (B, M, 4, 2)
    -> iou (B, H, W).

    custom_vjp with zero gradients: the IoU target is always consumed under
    stop_gradient (builder.py:185 block_grad), and AD must not trace into the
    Pallas kernel.

    ``topk_gt`` is the per-*block* candidate count G. Pixels are flattened
    **column-major** so each 2048-pixel block is 32 image columns × 64 rows —
    a few degrees of azimuth — making the block-level GT candidate list tight
    (row-major blocks would span most of a 360° row and see every box).
    When MORE than G GTs genuinely overlap a block (nv > G), the candidate
    list truncates at the G smallest-clearance rows — an accepted
    approximation (the dropped rows are the geometrically farthest; the
    result is a one-sided lower bound of the dense max-IoU, exact whenever
    nv <= G). tests/test_iou_target_pallas.py::test_crowded_block_cap pins
    this contract against the dense oracle.

    Far-block skip: candidates are ordered per block by *circumcircle
    clearance* (block-min center distance − block-max predicted circumradius
    − GT circumradius; degenerate/padded GT rows get +inf) and the kernel's
    clip loop runs only over the nv candidates with clearance <= 0 — any
    skipped (block, gt) pair provably has IoU 0, so the output is unchanged
    while most blocks of a sparse scene run few or zero clip iterations.
    ``skip_far`` selects the strategy: False/"none" (static full loop),
    "dyn" (dynamic trip count), "gate" (static loop, empty blocks skipped),
    True/"gate8" (8-unrolled dynamic trip count) — see _kernel.
    """
    mode = {True: "gate8", False: "none"}.get(skip_far, skip_far)
    B, H, W, _ = deltas.shape
    N = H * W
    M = gt_corners.shape[1]
    G = min(topk_gt, M) if topk_gt else M

    # column-major pixel order: (B, H, W, C) -> (B, W*H, C)
    deltas = deltas.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, N, 8)
    pc = pc.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, N, 3)
    gt_corners = gt_corners.astype(jnp.float32)

    # CCW-canonicalize GT quads, precompute |area|
    rev = gt_corners[..., jnp.asarray([0, 3, 2, 1]), :]
    gt_ccw = jnp.where(
        (polygon_area(gt_corners) < 0)[..., None, None], rev, gt_corners
    )
    gt_area = jnp.abs(polygon_area(gt_ccw))  # (B, M)

    # decoded centers for block-level candidate selection
    rxy = jnp.sqrt(pc[..., 0] ** 2 + pc[..., 1] ** 2)
    safe = jnp.maximum(rxy, EPS)
    cos_a = jnp.where(rxy > EPS, pc[..., 0] / safe, 1.0)
    sin_a = jnp.where(rxy > EPS, pc[..., 1] / safe, 0.0)
    ddx = deltas[..., 0] * jnp.abs(deltas[..., 0])
    ddy = deltas[..., 1] * jnp.abs(deltas[..., 1])
    cx = pc[..., 0] + ddx * cos_a - ddy * sin_a
    cy = pc[..., 1] + ddx * sin_a + ddy * cos_a

    nb = -(-N // TILE)  # blocks per batch element
    padN = nb * TILE - N

    gc = gt_ccw.mean(axis=-2)  # (B, M, 2)
    d2 = (cx[..., None] - gc[:, None, :, 0]) ** 2 + (
        cy[..., None] - gc[:, None, :, 1]
    ) ** 2  # (B, N, M)
    d2 = jnp.pad(d2, ((0, 0), (0, padN), (0, 0)), constant_values=jnp.inf)
    block_min = d2.reshape(B, nb, TILE, M).min(axis=2)  # (B, nb, M)

    # circumcircle clearance per (block, gt): if even the block's largest
    # predicted circle at its nearest pixel cannot reach the GT's circle,
    # every pixel of the block has IoU 0 with that GT
    r_pred = 0.5 * jnp.sqrt(
        jnp.exp(deltas[..., 2]) ** 2 + jnp.exp(deltas[..., 3]) ** 2
    )  # (B, N)
    rp = jnp.pad(r_pred, ((0, 0), (0, padN)))
    rp_max = rp.reshape(B, nb, TILE).max(axis=2)  # (B, nb)
    r_gt = jnp.sqrt(
        ((gt_ccw - gc[:, :, None, :]) ** 2).sum(-1).max(-1)
    )  # (B, M) corner-to-center circumradius
    clearance = (
        jnp.sqrt(block_min) - rp_max[..., None] - r_gt[:, None, :]
    )  # (B, nb, M)
    clearance = jnp.where(gt_area[:, None, :] < EPS, jnp.inf, clearance)

    # order candidates by ascending clearance with a sort-free rank trick
    # (lax.sort/top_k on small trailing axes is pathologically slow on v5e);
    # the kernel's dynamic trip count nv then makes "clearance <= 0" a prefix
    lt = clearance[..., None, :] < clearance[..., :, None]  # key_j < key_i
    eqk = clearance[..., None, :] == clearance[..., :, None]
    jlt = jnp.arange(M)[None, :] < jnp.arange(M)[:, None]  # tie-break: j < i
    rank = (lt | (eqk & jlt)).sum(-1).astype(jnp.int32)  # (B, nb, M)
    sel = rank[..., None, :] == jnp.arange(G, dtype=jnp.int32)[:, None]
    bidx = (sel * jnp.arange(M, dtype=jnp.int32)).sum(-1)  # (B, nb, G)
    nv = jnp.minimum(
        (clearance <= 0.0).sum(-1).astype(jnp.int32), G
    )  # (B, nb)
    if mode == "none":
        nv = jnp.full_like(nv, G)
    nv = nv.reshape(B * nb)

    # per-block candidate rows: [8 corners, area] × G; gate8 pads the table
    # to an 8-multiple with zero-area rows (exact IoU-0 no-ops)
    gt9 = jnp.concatenate(
        [gt_ccw.reshape(B, M, 8), gt_area[..., None]], axis=-1
    )  # (B, M, 9)
    cand = jax.vmap(lambda g, i: g[i.reshape(-1)])(gt9, bidx)  # (B, nb*G, 9)
    cand = cand.reshape(B * nb, G, 9)
    Gk = G
    if mode == "gate8" and G % 8:
        Gk = -(-G // 8) * 8
        cand = jnp.pad(cand, ((0, 0), (0, Gk - G), (0, 0)))
    cand = cand.reshape(B * nb, Gk * 9)

    def planar(x, C):
        x = jnp.pad(x, ((0, 0), (0, padN), (0, 0)))
        return (
            x.reshape(B * nb, TILE_S, TILE_L, C).transpose(0, 3, 1, 2)
        )

    deltas_p = planar(deltas, 8)
    pc_p = planar(pc, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, G=Gk, mode=mode),
        grid=(B * nb,),
        in_specs=[
            # whole candidate table in SMEM (blocked SMEM specs require
            # (8,128)-divisible blocks); rows indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # nv: per-block trip count
            pl.BlockSpec((1, 8, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nb, TILE_S, TILE_L), jnp.float32),
        interpret=interpret,
    )(cand, nv, deltas_p, pc_p)

    out = out.reshape(B, nb * TILE)[:, :N]
    # undo the column-major ordering
    return out.reshape(B, W, H).transpose(0, 2, 1)


def _iou_target_fwd(deltas, pc, gt_corners, topk_gt, interpret, skip_far):
    out = iou_target_fused(deltas, pc, gt_corners, topk_gt, interpret, skip_far)
    return out, (deltas, pc, gt_corners)


def _iou_target_bwd(topk_gt, interpret, skip_far, res, g):
    deltas, pc, gt_corners = res
    return (
        jnp.zeros_like(deltas),
        jnp.zeros_like(pc),
        jnp.zeros_like(gt_corners),
    )


iou_target_fused.defvjp(_iou_target_fwd, _iou_target_bwd)
