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
    r = 4 if ci <= 64 else 2
    while h % r:
        r //= 2
    return max(r, 1)


def _fwd_kernel(x_ref, w_ref, y_ref, slab, *, R, G, Ci, Co, W, out_dtype):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        # the epilogue below copies slab[R] into slab[0]; zeroing it here
        # makes step 1 see row -1 == 0 (SAME zero padding)
        slab[R] = jnp.zeros_like(slab[R])

    @pl.when(g > 0)
    def _():
        # slab rows [0, R+1): input rows R*(g-1) - 1 .. R*(g-1) + R - 1;
        # complete the window with the first row of the current block
        below = x_ref[0, 0]
        slab[R + 1] = jnp.where(g == G, jnp.zeros_like(below), below)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        not_first, not_last = lane > 0, lane < W - 1

        w = w_ref[...]  # (3*Co, 3*Ci): dx stacked in M, dy folded into K
        for r in range(R):
            # The three vertical taps ride in the contraction dim (K = 3*Ci;
            # the slab is row-contiguous, so the stack is a pure slice).
            s = slab[r : r + 3].reshape(3 * Ci, W)
            # Phase trick: the MXU sees only unshifted operands; the three
            # horizontal taps accumulate into per-dx phases that are rolled
            # *after* the matmul, in f32 (Mosaic cannot rotate bf16 lanes).
            if Ci < 128:
                # thin channels: fold the dx phases into M too — one
                # (3Co, 3Ci) matmul per row (measured best below 128 ch)
                acc_all = jax.lax.dot_general(
                    w, s,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                accs = [acc_all[dx * Co : (dx + 1) * Co] for dx in range(3)]
            else:
                # wide channels: K = 3*Ci is already whole 128-passes; three
                # separate (Co, 3Ci) matmuls pipeline better than one 3Co-tall
                accs = [
                    jax.lax.dot_general(
                        w[dx * Co : (dx + 1) * Co], s,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for dx in range(3)
                ]
            # y[w] = acc1[w] + acc0[w-1] + acc2[w+1], SAME zero padding
            zero = jnp.zeros_like(accs[1])
            acc = accs[1]
            acc = acc + jnp.where(not_first, pltpu.roll(accs[0], 1, axis=1),
                                  zero)
            acc = acc + jnp.where(not_last, pltpu.roll(accs[2], W - 1, axis=1),
                                  zero)
            y_ref[0, r] = acc.astype(out_dtype)

    # ingest the current group for the next step (reads before writes)
    prev_last = slab[R]
    slab[0] = prev_last
    slab[1 : R + 1] = x_ref[0]


def _conv3x3_fwd(x, w, rows_per_step=None, interpret=False):
    B, H, Ci, W = x.shape
    Co = w.shape[-1]
    assert w.shape == (3, 3, Ci, Co), w.shape
    R = rows_per_step or _pick_rows_per_step(Ci, H)
    assert H % R == 0, (H, R)
    G = H // R

    # (3(dx)*Co, 3(dy)*Ci): dy folded into the contraction dim — ordered to
    # match the slab's row-contiguous [dy=0 | dy=1 | dy=2] stacking — and the
    # dx phases stacked along the output dim
    wk = jnp.transpose(w, (1, 3, 0, 2)).reshape(3 * Co, 3 * Ci)
    kern = functools.partial(
        _fwd_kernel, R=R, G=G, Ci=Ci, Co=Co, W=W, out_dtype=x.dtype
    )
    return pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=[
            pl.BlockSpec(
                (1, R, Ci, W),
                lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3 * Co, 3 * Ci), lambda b, g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, R, Co, W),
            lambda b, g: (b, jnp.maximum(g - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), x.dtype),
        scratch_shapes=[pltpu.VMEM((R + 2, Ci, W), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the 128-ch full-width blocks need slightly over the default
            # 16 MiB scoped-vmem budget (v5e has 128 MiB physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, wk)


def _wgrad_kernel(x_ref, g_ref, dw_ref, slab, *, R, G, Ci, Co, W):
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
        below = x_ref[0, 0]
        slab[R + 1] = jnp.where(g == G, jnp.zeros_like(below), below)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        not_first, not_last = lane > 0, lane < W - 1

        # dK[dy,dx] = sum_w x_dy[w + dx - 1] g[w]  ==  sum_v x_dy[v] g_dx[v]
        # with g_dx the (1-dx)-shifted cotangent. The shift runs in f32
        # (Mosaic cannot rotate bf16) and is exact: rolling does not change
        # the bf16 values, so the round-trip through f32 is lossless.
        # All three dy taps ride in ONE matmul per (r, dx): the slab is
        # row-contiguous, so rows r..r+2 stack into the M dim for free.
        gshift = []
        for r in range(R):
            gf = g_ref[0, r].astype(jnp.float32)
            zero = jnp.zeros_like(gf)
            gm = jnp.where(not_last, pltpu.roll(gf, W - 1, axis=1), zero)
            gp = jnp.where(not_first, pltpu.roll(gf, 1, axis=1), zero)
            gshift.append(
                (gm.astype(g_ref.dtype), g_ref[0, r], gp.astype(g_ref.dtype))
            )

        for dx in range(3):
            acc = None
            for r in range(R):
                s = slab[r : r + 3].reshape(3 * Ci, W)
                o = jax.lax.dot_general(
                    s, gshift[r][dx],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (3*Ci, Co)
                acc = o if acc is None else acc + o
            dw_ref[:, dx] = dw_ref[:, dx] + acc.reshape(3, Ci, Co)

    prev_last = slab[R]
    slab[0] = prev_last
    slab[1 : R + 1] = x_ref[0]


def _conv3x3_wgrad(x, gy, rows_per_step=None, interpret=False):
    B, H, Ci, W = x.shape
    Co = gy.shape[2]
    R = rows_per_step or _pick_rows_per_step(Ci, H)
    assert H % R == 0, (H, R)
    G = H // R

    kern = functools.partial(_wgrad_kernel, R=R, G=G, Ci=Ci, Co=Co, W=W)
    return pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=[
            pl.BlockSpec(
                (1, R, Ci, W),
                lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, R, Co, W),
                lambda b, g: (b, jnp.maximum(g - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, Ci, Co), lambda b, g: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, Ci, Co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R + 2, Ci, W), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the 128-ch full-width blocks need slightly over the default
            # 16 MiB scoped-vmem budget (v5e has 128 MiB physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gy)


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
