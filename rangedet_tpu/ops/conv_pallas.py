"""Pallas 3x3 convolution kernels in (B, H, C, W) layout for the TPU MXU.

Re-implements the backbone/head conv stack of the reference
(rangedet/symbol/backbone/dla_backbone.py:18-161 basic blocks,
rangedet/symbol/head/builder.py:83-117 towers) as TPU-first kernels. The
range image is 64 px tall and ~2656 px wide; the XLA conv emitter sustains
only ~6-13% MXU on these shapes (BENCH.md), so the hot stride-1 3x3 convs
run as hand-written Pallas matmul kernels instead.

Layout choice (B, H, C, W):
  * channels sit in **sublanes**, width in **lanes** — every tap is a native
    MXU matmul (Co, Ci) @ (Ci, W) with channels as the contraction dim;
  * H is an untiled leading dim, so vertical taps need no tile-aligned halo
    DMA (the v5e requires (8,128)-aligned DMA slices);
  * horizontal taps are one-lane `pltpu.roll`s with edge masks — the SAME
    zero padding of the reference convs.

Grid walk: (batch, H-groups + 1), H innermost and sequential. A VMEM scratch
carries the previous group's rows, and each step writes the *previous*
group's output rows — every input byte is fetched from HBM exactly once
(read amplification 1.0, no halo re-reads).

The backward pass is two more kernels: dgrad reuses the forward kernel with
the spatially-flipped, (Ci,Co)-transposed weights; wgrad contracts
tap-shifted inputs against the output cotangent over the lane (width) dim
and accumulates the (3,3,Ci,Co) gradient in VMEM across the whole grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows_per_step(ci: int, h: int) -> int:
    # swept on v5e (BENCH.md round 2): 64-ch full-width convs peak at R=16,
    # 128-ch at R=4 (VMEM slab stays < 6 MB either way)
    r = 16 if ci <= 64 else 4
    while h % r:
        r //= 2
    return max(r, 1)


def _fill(n: int) -> float:
    """Fraction of the 128-wide MXU tiles a dimension of size n fills."""
    return n / (-(-n // 128) * 128)


def _pair_gain(ci: int, co: int) -> bool:
    """Pack TWO output rows into one matmul when it fills the MXU better.

    Row-major form: one (3dx*Co, 3dy*Ci) matmul per output row — for 64
    channels that is M=K=192, i.e. 56% fill of the 128x128 MXU. Pair form:
    (3dx*2*Co, 4dy*Ci) over the pair's 4-row input window — M=384/K=256
    full tiles with 3/4 of the MACs useful (each output row uses 3 of the
    4 window rows), so 64-ch effective utilization rises 0.5625 -> 0.75.
    The same arithmetic (with M/N swapped) covers wgrad.
    """
    eff_row = _fill(3 * ci) * _fill(3 * co)
    eff_pair = 0.75 * _fill(4 * ci) * _fill(6 * co)
    return eff_pair > eff_row * 1.05


def _ingest(rows, s_ref, b_ref):
    """Optional fused producer-BN: rows -> relu(rows * scale + bias).

    The affine runs in f32 (scale/bias are the f32 BN fold) and casts back;
    this replaces the standalone BN-apply+relu HBM pass of the producer."""
    if s_ref is None:
        return rows
    shape = (1,) * (rows.ndim - 2) + (rows.shape[-2], 1)
    rf = rows.astype(jnp.float32) * s_ref[...].reshape(shape)
    rf = rf + b_ref[...].reshape(shape)
    return jnp.maximum(rf, 0.0).astype(rows.dtype)


def _ingest_cot(rows, y_rows, c1_ref, c2_ref):
    """Stats-cotangent fold on gy ingest: gy_eff = gy + gs1 + 2·y·gs2
    (s1 = Σy, s2 = Σy² ⇒ their cotangents re-enter dy elementwise). Runs
    where the backward kernels load gy, so the adjusted cotangent never
    round-trips HBM."""
    if c1_ref is None:
        return rows
    shape = (1,) * (rows.ndim - 2) + (rows.shape[-2], 1)
    rf = rows.astype(jnp.float32) + c1_ref[...].reshape(shape)
    rf = rf + 2.0 * y_rows.astype(jnp.float32) * c2_ref[...].reshape(shape)
    return rf.astype(rows.dtype)


def _fwd_kernel(*refs, R, G, Ci, Co, W, affine, bwd_affine, stats, cot,
                out_dtype, pair=False):
    refs = list(refs)
    x_ref, w_ref = refs[:2]
    refs = refs[2:]
    s_ref = b_ref = None
    if affine:
        s_ref, b_ref = refs[:2]
        refs = refs[2:]
    yc_ref = c1_ref = c2_ref = None
    if cot:
        yc_ref, c1_ref, c2_ref = refs[:3]
        refs = refs[3:]
    xo_ref = s2_ref = b2_ref = dsc_ref = db_ref = None
    sum_ref = sq_ref = None
    if bwd_affine:
        xo_ref, s2_ref, b2_ref = refs[:3]
        y_ref, dsc_ref, db_ref, slab = refs[3:]
    elif stats:
        y_ref, sum_ref, sq_ref, slab = refs
    else:
        y_ref, slab = refs
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        # the epilogue below copies slab[R] into slab[0]; zeroing it here
        # makes step 1 see row -1 == 0 (SAME zero padding)
        slab[R] = jnp.zeros_like(slab[R])

    if bwd_affine:

        @pl.when(jnp.logical_and(pl.program_id(0) == 0, g == 0))
        def _():
            dsc_ref[...] = jnp.zeros_like(dsc_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

    if stats:

        @pl.when(jnp.logical_and(pl.program_id(0) == 0, g == 0))
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            sq_ref[...] = jnp.zeros_like(sq_ref)

    @pl.when(g > 0)
    def _():
        # slab rows [0, R+1): input rows R*(g-1) - 1 .. R*(g-1) + R - 1;
        # complete the window with the first row of the current block
        below = x_ref[0, 0]
        if cot:
            below = _ingest_cot(below, yc_ref[0, 0], c1_ref, c2_ref)
        below = _ingest(below, s_ref, b_ref)
        slab[R + 1] = jnp.where(g == G, jnp.zeros_like(below), below)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        not_first, not_last = lane > 0, lane < W - 1

        def emit_row(r, accs):
            # y[w] = acc1[w] + acc0[w-1] + acc2[w+1], SAME zero padding
            zero = jnp.zeros_like(accs[1])
            acc = accs[1]
            acc = acc + jnp.where(not_first, pltpu.roll(accs[0], 1, axis=1),
                                  zero)
            acc = acc + jnp.where(not_last, pltpu.roll(accs[2], W - 1, axis=1),
                                  zero)
            if bwd_affine:
                # this invocation is the dgrad of conv3x3_bnrelu: acc is the
                # cotangent of the *activated* input a = relu(x*s+b); finish
                # the affine/relu backward here so `da` never touches HBM:
                # dx = dz*s, dscale += sum(dz*x), dbias += sum(dz)
                s2 = s2_ref[...]  # (Co, 1) f32
                xf = xo_ref[0, r].astype(jnp.float32)
                z = xf * s2 + b2_ref[...]
                dz = jnp.where(z > 0, acc, 0.0)
                y_ref[0, r] = (dz * s2).astype(out_dtype)
                dsc_ref[...] += jnp.sum(dz * xf, axis=1, keepdims=True)
                db_ref[...] += jnp.sum(dz, axis=1, keepdims=True)
            else:
                yb = acc.astype(out_dtype)
                y_ref[0, r] = yb
                if stats:
                    # per-channel BatchNorm sums of the *stored* (rounded)
                    # output — bit-matching stats computed from y in XLA
                    yf = yb.astype(jnp.float32)
                    sum_ref[...] += jnp.sum(yf, axis=1, keepdims=True)
                    sq_ref[...] += jnp.sum(yf * yf, axis=1, keepdims=True)

        w = w_ref[...]
        if pair:
            # Two output rows per matmul over their shared 4-row input
            # window: (3dx*2*Co, 4dy*Ci) @ (4Ci, W) — full MXU tiles at
            # 64 channels, 3/4 useful MACs (see _pair_gain). The packed
            # weight's M order is dx-major then row (j) then Co.
            for q in range(R // 2):
                s = slab[2 * q : 2 * q + 4].reshape(4 * Ci, W)
                acc_all = jax.lax.dot_general(
                    w, s,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for j in range(2):
                    emit_row(2 * q + j, [
                        acc_all[(dx * 2 + j) * Co : (dx * 2 + j + 1) * Co]
                        for dx in range(3)
                    ])
        else:
            # w: (3*Co, 3*Ci) — dx stacked in M, dy folded into K
            for r in range(R):
                # The three vertical taps ride in the contraction dim
                # (K = 3*Ci; the slab is row-contiguous, so the stack is a
                # pure slice). Phase trick: the MXU sees only unshifted
                # operands; the three horizontal taps accumulate into per-dx
                # phases that are rolled *after* the matmul, in f32 (Mosaic
                # cannot rotate bf16 lanes).
                s = slab[r : r + 3].reshape(3 * Ci, W)
                if Ci < 128:
                    # thin channels: fold the dx phases into M too — one
                    # (3Co, 3Ci) matmul per row (measured best below 128 ch)
                    acc_all = jax.lax.dot_general(
                        w, s,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    accs = [
                        acc_all[dx * Co : (dx + 1) * Co] for dx in range(3)
                    ]
                else:
                    # wide channels: K = 3*Ci is already whole 128-passes;
                    # three separate (Co, 3Ci) matmuls pipeline better than
                    # one 3Co-tall
                    accs = [
                        jax.lax.dot_general(
                            w[dx * Co : (dx + 1) * Co], s,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for dx in range(3)
                    ]
                emit_row(r, accs)

    # ingest the current group for the next step (reads before writes)
    prev_last = slab[R]
    slab[0] = prev_last
    rows = x_ref[0]
    if cot:
        rows = _ingest_cot(rows, yc_ref[0], c1_ref, c2_ref)
    slab[1 : R + 1] = _ingest(rows, s_ref, b_ref)


def _affine_specs_operands(in_specs, operands, in_scale, in_bias, Ci):
    if in_scale is None:
        return in_specs, operands
    spec = pl.BlockSpec((Ci, 1), lambda b, g: (0, 0), memory_space=pltpu.VMEM)
    return in_specs + [spec, spec], operands + [
        in_scale.reshape(Ci, 1).astype(jnp.float32),
        in_bias.reshape(Ci, 1).astype(jnp.float32),
    ]


def _conv3x3_fwd(x, w, rows_per_step=None, interpret=False,
                 in_scale=None, in_bias=None, bwd_affine=None, stats=False,
                 cot_adjust=None):
    """bwd_affine (dgrad-of-fused use only): a tuple (xo, scale, bias) of the
    fused op's raw input and producer fold; the kernel then returns
    (dx, dscale, dbias) with the relu/affine backward fused into the
    epilogue instead of the plain convolution output.

    stats: additionally return per-output-channel BatchNorm sums
    (sum y, sum y^2) accumulated across the grid — (y, s1, s2) — so the BN
    of this conv needs no separate stats pass over HBM.

    cot_adjust (dgrad use): a tuple (y, gs1, gs2) — fold the stats-output
    cotangents into the loaded gy (gy + gs1 + 2·y·gs2) on slab ingest."""
    B, H, Ci, W = x.shape
    Co = w.shape[-1]
    assert w.shape == (3, 3, Ci, Co), w.shape
    assert not (stats and bwd_affine is not None)
    R = rows_per_step or _pick_rows_per_step(Ci, H)
    assert H % R == 0, (H, R)
    G = H // R

    pair = Ci < 128 and R % 2 == 0 and _pair_gain(Ci, Co)
    if pair:
        # (3dx*2*Co, 4dy*Ci): row j of a pair uses window rows j..j+2; the
        # unused (row, dy4) slots stay zero (the 25% non-useful MACs)
        wt = jnp.transpose(w, (1, 3, 0, 2))  # (3dx, Co, 3dy, Ci)
        w4 = jnp.zeros((3, 2, Co, 4, Ci), w.dtype)
        for j in range(2):
            w4 = w4.at[:, j, :, j : j + 3].set(wt)
        wk = w4.reshape(6 * Co, 4 * Ci)
    else:
        # (3(dx)*Co, 3(dy)*Ci): dy folded into the contraction dim — ordered
        # to match the slab's row-contiguous [dy=0 | dy=1 | dy=2] stacking —
        # and the dx phases stacked along the output dim
        wk = jnp.transpose(w, (1, 3, 0, 2)).reshape(3 * Co, 3 * Ci)
    kern = functools.partial(
        _fwd_kernel, R=R, G=G, Ci=Ci, Co=Co, W=W,
        affine=in_scale is not None, bwd_affine=bwd_affine is not None,
        stats=stats, cot=cot_adjust is not None, out_dtype=x.dtype, pair=pair
    )
    halo_spec = pl.BlockSpec(
        (1, R, Ci, W),
        lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        halo_spec,
        pl.BlockSpec(
            wk.shape, lambda b, g: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    in_specs, operands = _affine_specs_operands(
        in_specs, [x, wk], in_scale, in_bias, Ci
    )
    if cot_adjust is not None:
        yc, gs1, gs2 = cot_adjust
        in_specs.append(halo_spec)  # y, same halo walk as gy
        operands.append(yc)
        in_specs, operands = _affine_specs_operands(
            in_specs, operands, gs1, gs2, Ci
        )
    out_spec = pl.BlockSpec(
        (1, R, Co, W),
        lambda b, g: (b, jnp.maximum(g - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((B, H, Co, W), x.dtype)
    vec = pl.BlockSpec((Co, 1), lambda b, g: (0, 0), memory_space=pltpu.VMEM)
    if bwd_affine is not None:
        xo, scale, bias = bwd_affine
        in_specs.append(out_spec)  # raw x, aligned to the output rows
        operands.append(xo)
        in_specs, operands = _affine_specs_operands(
            in_specs, operands, scale, bias, Co
        )
        out_specs = (out_spec, vec, vec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((Co, 1), jnp.float32),
            jax.ShapeDtypeStruct((Co, 1), jnp.float32),
        )
    elif stats:
        out_specs = (out_spec, vec, vec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((Co, 1), jnp.float32),
            jax.ShapeDtypeStruct((Co, 1), jnp.float32),
        )
    return pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R + 2, Ci, W), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the 128-ch full-width blocks need slightly over the default
            # 16 MiB scoped-vmem budget (v5e has 128 MiB physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _wgrad_kernel(*refs, R, G, Ci, Co, W, affine, cot, pair=False):
    refs = list(refs)
    x_ref, g_ref = refs[:2]
    refs = refs[2:]
    s_ref = b_ref = None
    if affine:
        s_ref, b_ref = refs[:2]
        refs = refs[2:]
    yc_ref = c1_ref = c2_ref = None
    if cot:
        yc_ref, c1_ref, c2_ref = refs[:3]
        refs = refs[3:]
    dw_ref, slab = refs
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, g == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    @pl.when(g == 0)
    def _():
        slab[R] = jnp.zeros_like(slab[R])  # epilogue moves this into slab[0]

    @pl.when(g > 0)
    def _():
        below = _ingest(x_ref[0, 0], s_ref, b_ref)
        slab[R + 1] = jnp.where(g == G, jnp.zeros_like(below), below)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        not_first, not_last = lane > 0, lane < W - 1

        # dK[dy,dx] = sum_w x_dy[w + dx - 1] g[w]  ==  sum_v x_dy[v] g_dx[v]
        # with g_dx the (1-dx)-shifted cotangent. The shift runs in f32
        # (Mosaic cannot rotate bf16 lanes) and is exact: rolling does not
        # change the bf16 values, so the f32 round-trip is lossless.
        # ALL NINE taps ride in ONE matmul per row: the slab is
        # row-contiguous, so rows r..r+2 stack into M (= 3Ci) for free, and
        # the three dx-shifted cotangents stack into N (= 3Co) — a
        # (3Ci, W) @ (W, 3Co) contraction instead of three thin N=Co ones
        # (the N=64 matmuls left half the MXU columns idle; profiled
        # backward at 3x forward cost on v5e).
        # pair mode: two rows per matmul — M = 4Ci (the pair's input
        # window), N = 2*3Co (both rows' shifted cotangents); the caller
        # unpacks the (4Ci, 6Co) accumulator (see _pair_gain).
        def gstack_row(r):
            gr = g_ref[0, r]
            if cot:  # fold the stats cotangents into gy on load
                gr = _ingest_cot(gr, yc_ref[0, r], c1_ref, c2_ref)
            gf = gr.astype(jnp.float32)
            zero = jnp.zeros_like(gf)
            gm = jnp.where(not_last, pltpu.roll(gf, W - 1, axis=1), zero)
            gp = jnp.where(not_first, pltpu.roll(gf, 1, axis=1), zero)
            return [
                gm.astype(g_ref.dtype),
                gr.astype(g_ref.dtype),
                gp.astype(g_ref.dtype),
            ]  # dx-major

        acc = None
        if pair:
            for q in range(R // 2):
                gstack = jnp.concatenate(
                    gstack_row(2 * q) + gstack_row(2 * q + 1), axis=0
                )  # (2*3*Co, W), row-major then dx-major
                s = slab[2 * q : 2 * q + 4].reshape(4 * Ci, W)
                o = jax.lax.dot_general(
                    s, gstack,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (4*Ci, 6*Co)
                acc = o if acc is None else acc + o
        else:
            for r in range(R):
                gstack = jnp.concatenate(gstack_row(r), axis=0)  # (3*Co, W)
                s = slab[r : r + 3].reshape(3 * Ci, W)
                o = jax.lax.dot_general(
                    s, gstack,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (3*Ci, 3*Co)
                acc = o if acc is None else acc + o
        # accumulate in the packed (dy-major rows, dx-major cols) form —
        # Mosaic cannot split the lane dim in-kernel; the caller unpacks
        # with a free XLA reshape/transpose
        dw_ref[...] = dw_ref[...] + acc

    prev_last = slab[R]
    slab[0] = prev_last
    slab[1 : R + 1] = _ingest(x_ref[0], s_ref, b_ref)


def _conv3x3_wgrad(x, gy, rows_per_step=None, interpret=False,
                   in_scale=None, in_bias=None, cot_adjust=None):
    B, H, Ci, W = x.shape
    Co = gy.shape[2]
    R = rows_per_step or _pick_rows_per_step(Ci, H)
    assert H % R == 0, (H, R)
    G = H // R

    pair = R % 2 == 0 and _pair_gain(Ci, Co)
    kern = functools.partial(
        _wgrad_kernel, R=R, G=G, Ci=Ci, Co=Co, W=W,
        affine=in_scale is not None, cot=cot_adjust is not None, pair=pair,
    )
    g_spec = pl.BlockSpec(
        (1, R, Co, W),
        lambda b, g: (b, jnp.maximum(g - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (1, R, Ci, W),
            lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        g_spec,
    ]
    in_specs, operands = _affine_specs_operands(
        in_specs, [x, gy], in_scale, in_bias, Ci
    )
    if cot_adjust is not None:
        yc, gs1, gs2 = cot_adjust
        in_specs.append(g_spec)  # y, same aligned walk as gy
        operands.append(yc)
        in_specs, operands = _affine_specs_operands(
            in_specs, operands, gs1, gs2, Co
        )
    acc_shape = (4 * Ci, 6 * Co) if pair else (3 * Ci, 3 * Co)
    packed = pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            acc_shape, lambda b, g: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(acc_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 2, Ci, W), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the 128-ch full-width blocks need slightly over the default
            # 16 MiB scoped-vmem budget (v5e has 128 MiB physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if pair:
        # unpack (dy4·Ci, (j,dx)·Co): window row dy4 is tap dy4-j of pair
        # row j => dK[dy] = p[dy, j=0] + p[dy+1, j=1]
        p = packed.reshape(4, Ci, 2, 3, Co)
        return (p[0:3, :, 0] + p[1:4, :, 1]).transpose(0, 2, 1, 3)
    # unpack (dy·Ci, dx·Co) -> (dy, dx, Ci, Co); free in XLA
    return packed.reshape(3, Ci, 3, Co).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_bhcw(x, w, rows_per_step=None, interpret=False):
    """SAME-padded stride-1 3x3 conv on (B, H, C, W) input.

    Numerically matches ``lax.conv_general_dilated`` up to f32-accumulation
    reassociation: every tap product is accumulated in f32 (the vertical taps
    ride inside one 3*Ci-deep matmul, the horizontal phases are added after),
    so results agree with XLA's conv to ~1e-4 in bf16. ``w`` is (3, 3, Ci,
    Co) in the input dtype; gradients have matching dtypes (f32-accumulated,
    rounded).
    """
    return _conv3x3_fwd(x, w, rows_per_step, interpret)


def _conv3x3_vjp_fwd(x, w, rows_per_step, interpret):
    return _conv3x3_fwd(x, w, rows_per_step, interpret), (x, w)


def _conv3x3_vjp_bwd(rows_per_step, interpret, res, gy):
    x, w = res
    # dgrad: conv of gy with the 180°-rotated, (Ci,Co)-swapped kernel
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_fwd(gy, w_flip, rows_per_step, interpret)
    dw = _conv3x3_wgrad(x, gy, rows_per_step, interpret)
    return dx, dw.astype(w.dtype)


conv3x3_bhcw.defvjp(_conv3x3_vjp_fwd, _conv3x3_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_bnrelu_bhcw(x, w, scale, bias, rows_per_step=None,
                        interpret=False):
    """conv3x3(relu(x * scale + bias)) with the affine+relu fused into the
    kernels' VMEM ingest — the producer's BatchNorm apply folded into this
    conv, so the activated tensor never round-trips HBM.

    ``scale``/``bias`` are the f32 per-channel BN fold of the *producer*
    (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps)); gradients flow
    to all four of (x, w, scale, bias), so BN statistics backward is exact.
    Equivalent of the reference's conv-BN-relu chaining
    (mxnext/simple.py:502, head towers builder.py:198-266) without the
    inter-op memory traffic.
    """
    return _conv3x3_fwd(x, w, rows_per_step, interpret, scale, bias)


def _bnrelu_vjp_fwd(x, w, scale, bias, rows_per_step, interpret):
    y = _conv3x3_fwd(x, w, rows_per_step, interpret, scale, bias)
    return y, (x, w, scale, bias)


def _bnrelu_vjp_bwd(rows_per_step, interpret, res, gy):
    x, w, scale, bias = res
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    # dgrad with the relu/affine backward fused into its epilogue: the
    # activated-input cotangent `da` lives only in VMEM; dscale/dbias
    # accumulate across the grid (no standalone XLA reduction passes)
    dx, dscale, dbias = _conv3x3_fwd(
        gy, w_flip, rows_per_step, interpret, bwd_affine=(x, scale, bias)
    )
    # wgrad recomputes a on ingest (reads raw x + gy only)
    dw = _conv3x3_wgrad(x, gy, rows_per_step, interpret, scale, bias)
    return dx, dw.astype(w.dtype), dscale[:, 0], dbias[:, 0]


conv3x3_bnrelu_bhcw.defvjp(_bnrelu_vjp_fwd, _bnrelu_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_stats_bhcw(x, w, rows_per_step=None, interpret=False):
    """conv3x3_bhcw that also returns the per-channel BatchNorm sums
    (y, Σy, Σy²) accumulated inside the kernel — the consumer BN needs no
    separate stats pass over the output tensor."""
    y, s1, s2 = _conv3x3_fwd(x, w, rows_per_step, interpret, stats=True)
    return y, s1[:, 0], s2[:, 0]


def _stats_vjp_fwd(x, w, rows_per_step, interpret):
    y, s1, s2 = _conv3x3_fwd(x, w, rows_per_step, interpret, stats=True)
    return (y, s1[:, 0], s2[:, 0]), (x, w, y)


def _stats_vjp_bwd(rows_per_step, interpret, res, ct):
    x, w, y = res
    gy, gs1, gs2 = ct
    # the stats cotangents fold into gy on each kernel's ingest (no
    # materialized gy_eff pass; see _ingest_cot)
    cot = (y, gs1, gs2)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_fwd(gy, w_flip, rows_per_step, interpret, cot_adjust=cot)
    dw = _conv3x3_wgrad(x, gy, rows_per_step, interpret, cot_adjust=cot)
    return dx, dw.astype(w.dtype)


conv3x3_stats_bhcw.defvjp(_stats_vjp_fwd, _stats_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_bnrelu_stats_bhcw(x, w, scale, bias, rows_per_step=None,
                              interpret=False):
    """conv3x3_bnrelu_bhcw + in-kernel output stats: the full fused
    conv-BN-relu chain link — producer BN applied on ingest, this conv's
    BN sums accumulated on the way out. Returns (y, Σy, Σy²)."""
    y, s1, s2 = _conv3x3_fwd(
        x, w, rows_per_step, interpret, scale, bias, stats=True
    )
    return y, s1[:, 0], s2[:, 0]


def _bnrelu_stats_vjp_fwd(x, w, scale, bias, rows_per_step, interpret):
    y, s1, s2 = _conv3x3_fwd(
        x, w, rows_per_step, interpret, scale, bias, stats=True
    )
    return (y, s1[:, 0], s2[:, 0]), (x, w, scale, bias, y)


def _bnrelu_stats_vjp_bwd(rows_per_step, interpret, res, ct):
    x, w, scale, bias, y = res
    gy, gs1, gs2 = ct
    cot = (y, gs1, gs2)
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx, dscale, dbias = _conv3x3_fwd(
        gy, w_flip, rows_per_step, interpret,
        bwd_affine=(x, scale, bias), cot_adjust=cot,
    )
    dw = _conv3x3_wgrad(
        x, gy, rows_per_step, interpret, scale, bias, cot_adjust=cot
    )
    return dx, dw.astype(w.dtype), dscale[:, 0], dbias[:, 0]


conv3x3_bnrelu_stats_bhcw.defvjp(_bnrelu_stats_vjp_fwd, _bnrelu_stats_vjp_bwd)
