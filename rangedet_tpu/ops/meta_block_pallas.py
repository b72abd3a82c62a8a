"""Fully-fused Meta-Kernel BLOCK for the bhcw layout: Meta-Kernel taps →
BatchNorm(9C) apply → relu → 1×1 aggregation conv, with the (B, H, 9C, W)
weighted-neighborhood tensor NEVER materialized in HBM.

The reference chain (dla_backbone.py:59-103: meta_baseline_bias →
point_wise_mlp_bn1 → relu → aggregation_conv1) and our einsum formulation
(models/meta_kernel.py + layers.conv1x1_bhcw) stream the 9C tensor — 782 MB
bf16 at full size — through HBM several times per step (≈10 ms/step
profiled, BENCH.md r3). The TPU-first fix is recompute-over-HBM: the taps
cost ~15 GFLOP to rebuild from feat+coords, so

  * pass A (``meta_stats_bhcw``) computes the taps tile-by-tile in VMEM and
    accumulates only the per-channel BatchNorm sums (Σa, Σa²) of the 9C
    channels;
  * XLA turns the sums into the BN fold (scale9, bias9) — running-stats
    update, psum for sync-BN etc. stay in the Flax BatchNorm machinery;
  * pass B (``meta_agg_bhcw``) RECOMPUTES the taps, applies the fold + relu
    in-register and contracts straight into the aggregation kernel,
    emitting only the (B, H, Co, W) block output.

Backward is two more recompute passes (one per custom-vjp op): the agg op's
bwd rebuilds the taps, forms dz = (Aᵀ·gy)·[z>0], and accumulates dA,
ds9/db9 (the BN-fold cotangents), the MLP gradients, and dfeat (the 3×3
tap scatter via a two-group-lagged accumulation slab); the stats op's bwd
is the same template with da = ds1 + 2·ds2·a (the sums' elementwise
cotangent) in place of the dz chain. Coordinates get no gradient (they are
network input data).

Grid/walk matches ops/conv_pallas.py: (batch, H-groups [+lag]) with VMEM
slabs carrying the halo rows — every input byte is read once per pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _pick_rows(h: int) -> int:
    r = 4
    while h % r:
        r //= 2
    return max(r, 1)


def _shift(v, dx, not_first, not_last, W):
    """Column w of the result holds v[w + dx - 1], zero outside (im2col
    pad=1 semantics). v (C, W) f32."""
    if dx == 1:
        return v
    if dx == 0:
        return jnp.where(not_first, pltpu.roll(v, 1, axis=1), 0.0)
    return jnp.where(not_last, pltpu.roll(v, W - 1, axis=1), 0.0)


def _taps_row(slab_f, slab_c, r, W, w0, b0, w1t, b1, masks):
    """The 9 taps of output row r: yields (t, a, h1, rel, wt, nb); the slab
    holds rows r-1..r+1 at slab[r..r+2]. a = bf16-rounded tap product."""
    not_first, not_last = masks
    center = slab_c[r + 1, :3, :].astype(jnp.float32)
    for t, (dy, dx) in enumerate(_TAPS):
        crow = slab_c[r + dy, :3, :].astype(jnp.float32)
        rel = _shift(crow, dx, not_first, not_last, W) - center  # (3, W)
        h1 = (
            w0[0][:, None] * rel[0][None, :]
            + w0[1][:, None] * rel[1][None, :]
            + w0[2][:, None] * rel[2][None, :]
            + b0
        )
        h1 = jnp.maximum(h1, 0.0)  # (Cm, W)
        wt = (
            jax.lax.dot_general(
                w1t, h1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1
        )  # (C, W)
        nb = _shift(
            slab_f[r + dy].astype(jnp.float32), dx, not_first, not_last, W
        )
        # round the tap product to the compute dtype — matches the unfused
        # path, where the (B, H, 9C, W) tensor materializes in feat.dtype
        a = (nb * wt).astype(slab_f.dtype).astype(jnp.float32)
        yield t, a, h1, rel, wt, nb


def _ingest(slab_f, slab_c, f_ref, c_ref, R, G, g):
    below_f = f_ref[0, 0]
    below_c = c_ref[0, 0]
    slab_f[R + 1] = jnp.where(g >= G, jnp.zeros_like(below_f), below_f)
    slab_c[R + 1] = jnp.where(g >= G, jnp.zeros_like(below_c), below_c)


def _epilogue(slab_f, slab_c, f_ref, c_ref, R):
    prev_f = slab_f[R]
    prev_c = slab_c[R]
    slab_f[0] = prev_f
    slab_c[0] = prev_c
    slab_f[1 : R + 1] = f_ref[0]
    slab_c[1 : R + 1] = c_ref[0]


def _fwd_kernel(*refs, R, G, C, Cm, Co, W, mode):
    if mode == "stats":
        (f_ref, c_ref, w0_ref, b0_ref, w1t_ref, b1_ref,
         s1_ref, s2_ref, slab_f, slab_c) = refs
    else:
        (f_ref, c_ref, w0_ref, b0_ref, w1t_ref, b1_ref,
         s9_ref, b9_ref, at_ref, out_ref, slab_f, slab_c) = refs
    g = pl.program_id(1)
    masks = (
        jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) > 0,
        jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) < W - 1,
    )

    @pl.when(g == 0)
    def _():
        slab_f[R] = jnp.zeros_like(slab_f[R])
        slab_c[R] = jnp.zeros_like(slab_c[R])

    if mode == "stats":

        @pl.when(jnp.logical_and(pl.program_id(0) == 0, g == 0))
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

    @pl.when(g > 0)
    def _():
        _ingest(slab_f, slab_c, f_ref, c_ref, R, G, g)
        w0 = w0_ref[...].astype(jnp.float32)
        b0 = b0_ref[...].astype(jnp.float32)
        w1t = w1t_ref[...].astype(jnp.float32)
        b1 = b1_ref[...].astype(jnp.float32)
        for r in range(R):
            acc = None
            for t, a, h1, rel, wt, nb in _taps_row(
                slab_f, slab_c, r, W, w0, b0, w1t, b1, masks
            ):
                if mode == "stats":
                    s1_ref[t * C : (t + 1) * C] += jnp.sum(
                        a, axis=1, keepdims=True
                    )
                    s2_ref[t * C : (t + 1) * C] += jnp.sum(
                        a * a, axis=1, keepdims=True
                    )
                else:
                    z = a * s9_ref[t * C : (t + 1) * C] + b9_ref[
                        t * C : (t + 1) * C
                    ]
                    o = jax.lax.dot_general(
                        at_ref[t * Co : (t + 1) * Co],
                        jnp.maximum(z, 0.0),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = o if acc is None else acc + o
            if mode == "agg":
                out_ref[0, r] = acc.astype(out_ref.dtype)

    _epilogue(slab_f, slab_c, f_ref, c_ref, R)


def _bwd_kernel(*refs, R, G, C, Cm, Co, W, mode):
    """Backward template. Writes dfeat with a TWO-group lag: dfeat row u is
    complete only after source row u+1 is processed, so the accumulation
    slab carries 2R+2 rows and group q is written at grid step q+2.

    mode "agg": da = (Aᵀ·gy masked by z>0) · s9; also accumulates dA,
    ds9_raw = Σ dz·a, db9_raw = Σ dz.
    mode "stats": da = c1 + c2·a (cotangent of the channel sums).
    """
    if mode == "agg":
        (f_ref, c_ref, w0_ref, b0_ref, w1t_ref, b1_ref,
         s9_ref, b9_ref, arows_ref, at_ref, gy_ref,
         dfeat_ref, dA_ref, ds9_ref, db9_ref,
         dw0_ref, db0_ref, dw1t_ref, db1_ref,
         slab_f, slab_c, acc_df) = refs
    else:
        (f_ref, c_ref, w0_ref, b0_ref, w1t_ref, b1_ref,
         c1_ref, c2_ref,
         dfeat_ref,
         dw0_ref, db0_ref, dw1t_ref, db1_ref,
         slab_f, slab_c, acc_df) = refs
    g = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    masks = (lane > 0, lane < W - 1)
    not_first, not_last = masks

    @pl.when(g == 0)
    def _():
        slab_f[R] = jnp.zeros_like(slab_f[R])
        slab_c[R] = jnp.zeros_like(slab_c[R])
        for i in range(2 * R + 2):
            acc_df[i] = jnp.zeros_like(acc_df[i])

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, g == 0))
    def _():
        dw0_ref[...] = jnp.zeros_like(dw0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dw1t_ref[...] = jnp.zeros_like(dw1t_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        if mode == "agg":
            dA_ref[...] = jnp.zeros_like(dA_ref)
            ds9_ref[...] = jnp.zeros_like(ds9_ref)
            db9_ref[...] = jnp.zeros_like(db9_ref)

    @pl.when(jnp.logical_and(g > 0, g <= G))
    def _():
        _ingest(slab_f, slab_c, f_ref, c_ref, R, G, g)
        w0 = w0_ref[...].astype(jnp.float32)
        b0 = b0_ref[...].astype(jnp.float32)
        w1t = w1t_ref[...].astype(jnp.float32)
        b1 = b1_ref[...].astype(jnp.float32)
        for r in range(R):
            if mode == "agg":
                gy = gy_ref[0, r].astype(jnp.float32)  # (Co, W)
            for t, a, h1, rel, wt, nb in _taps_row(
                slab_f, slab_c, r, W, w0, b0, w1t, b1, masks
            ):
                dy_t, dx_t = _TAPS[t]
                if mode == "agg":
                    s9 = s9_ref[t * C : (t + 1) * C]
                    z = a * s9 + b9_ref[t * C : (t + 1) * C]
                    darelu = jax.lax.dot_general(
                        arows_ref[t * C : (t + 1) * C], gy,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (C, W)  = A_t · gy
                    dz = jnp.where(z > 0, darelu, 0.0)
                    dA_ref[t * C : (t + 1) * C] += jax.lax.dot_general(
                        jnp.maximum(z, 0.0), gy,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (C, Co)
                    ds9_ref[t * C : (t + 1) * C] += jnp.sum(
                        dz * a, axis=1, keepdims=True
                    )
                    db9_ref[t * C : (t + 1) * C] += jnp.sum(
                        dz, axis=1, keepdims=True
                    )
                    da = dz * s9
                else:
                    da = (
                        c1_ref[t * C : (t + 1) * C]
                        + c2_ref[t * C : (t + 1) * C] * a
                    )
                dnb = da * wt
                dwt = da * nb
                # scatter dnb back to feat row (src + dy - 1), col (w+dx-1):
                # reverse the column shift, accumulate at slab index
                # R + r + dy - 1 (acc base = two groups behind, see below)
                if dx_t == 1:
                    sc = dnb
                elif dx_t == 0:
                    sc = jnp.where(
                        not_last, pltpu.roll(dnb, W - 1, axis=1), 0.0
                    )
                else:
                    sc = jnp.where(not_first, pltpu.roll(dnb, 1, axis=1), 0.0)
                acc_df[R + r + dy_t - 1] += sc
                # MLP backward
                db1_ref[...] += jnp.sum(dwt, axis=1, keepdims=True)
                dw1t_ref[...] += jax.lax.dot_general(
                    dwt, h1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (C, Cm)
                dh1 = jax.lax.dot_general(
                    w1t, dwt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (Cm, W)
                dh1 = jnp.where(h1 > 0, dh1, 0.0)
                db0_ref[...] += jnp.sum(dh1, axis=1, keepdims=True)
                for k in range(3):
                    dw0_ref[k : k + 1, :] += jnp.sum(
                        dh1 * rel[k][None, :], axis=1, keepdims=True
                    ).reshape(1, Cm)

    # write group g-2 (complete once source (g-1)R — handled above — ran)
    @pl.when(g >= 2)
    def _():
        for r in range(R):
            dfeat_ref[0, r] = acc_df[r].astype(dfeat_ref.dtype)

    # shift the accumulator down one group and clear the fresh region
    for i in range(R + 2):
        v = acc_df[i + R]
        acc_df[i] = v
    for i in range(R + 2, 2 * R + 2):
        acc_df[i] = jnp.zeros_like(acc_df[i])

    @pl.when(g <= G)
    def _():
        _epilogue(slab_f, slab_c, f_ref, c_ref, R)


# =============================================================================
# pallas_call wrappers
# =============================================================================
def _common_specs(R, G, C, W, dtype):
    f_spec = pl.BlockSpec(
        (1, R, C, W), lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    c_spec = pl.BlockSpec(
        (1, R, 8, W), lambda b, g: (b, jnp.minimum(g, G - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    vec = lambda n: pl.BlockSpec(
        (n, 1), lambda b, g: (0, 0), memory_space=pltpu.VMEM
    )
    mat = lambda m, n: pl.BlockSpec(
        (m, n), lambda b, g: (0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((R + 2, C, W), dtype),
        pltpu.VMEM((R + 2, 8, W), dtype),
    ]
    return f_spec, c_spec, vec, mat, scratch


def _prep(feat, cb, w0, b0, w1, b1):
    B, H, C, W = feat.shape
    Cm = w0.shape[1]
    cb8 = jnp.pad(cb, ((0, 0), (0, 0), (0, 5), (0, 0))).astype(feat.dtype)
    w0p = jnp.pad(w0, ((0, 5), (0, 0))).astype(jnp.float32)  # (8, Cm)
    b0c = b0.reshape(Cm, 1).astype(jnp.float32)
    w1t = jnp.transpose(w1).astype(jnp.float32)  # (C, Cm)
    b1c = b1.reshape(C, 1).astype(jnp.float32)
    return cb8, w0p, b0c, w1t, b1c


def meta_stats_pallas(feat, cb, w0, b0, w1, b1, interpret=False):
    """(Σa, Σa²) over the 9C tap channels; a is the bf16 tap product."""
    B, H, C, W = feat.shape
    Cm = w0.shape[1]
    R = _pick_rows(H)
    G = H // R
    cb8, w0p, b0c, w1t, b1c = _prep(feat, cb, w0, b0, w1, b1)
    f_spec, c_spec, vec, mat, scratch = _common_specs(R, G, C, W, feat.dtype)
    kern = functools.partial(
        _fwd_kernel, R=R, G=G, C=C, Cm=Cm, Co=0, W=W, mode="stats"
    )
    s1, s2 = pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=[f_spec, c_spec, mat(8, Cm), vec(Cm), mat(C, Cm), vec(C)],
        out_specs=(vec(9 * C), vec(9 * C)),
        out_shape=(
            jax.ShapeDtypeStruct((9 * C, 1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, 1), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(feat, cb8, w0p, b0c, w1t, b1c)
    return s1[:, 0], s2[:, 0]


def meta_agg_pallas(feat, cb, w0, b0, w1, b1, s9, b9, agg, interpret=False):
    """relu(a·s9 + b9) contracted with agg (9C, Co) -> (B, H, Co, W)."""
    B, H, C, W = feat.shape
    Cm = w0.shape[1]
    Co = agg.shape[1]
    R = _pick_rows(H)
    G = H // R
    cb8, w0p, b0c, w1t, b1c = _prep(feat, cb, w0, b0, w1, b1)
    # Aᵀ with tap-major rows: (9, C, Co) -> (9, Co, C) -> (9Co, C)
    at_rows = jnp.transpose(
        agg.reshape(9, C, Co), (0, 2, 1)
    ).reshape(9 * Co, C).astype(jnp.float32)
    f_spec, c_spec, vec, mat, scratch = _common_specs(R, G, C, W, feat.dtype)
    out_spec = pl.BlockSpec(
        (1, R, Co, W), lambda b, g: (b, jnp.maximum(g - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kern = functools.partial(
        _fwd_kernel, R=R, G=G, C=C, Cm=Cm, Co=Co, W=W, mode="agg"
    )
    return pl.pallas_call(
        kern,
        grid=(B, G + 1),
        in_specs=[
            f_spec, c_spec, mat(8, Cm), vec(Cm), mat(C, Cm), vec(C),
            vec(9 * C), vec(9 * C), mat(9 * Co, C),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), feat.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        feat, cb8, w0p, b0c, w1t, b1c,
        s9.reshape(9 * C, 1).astype(jnp.float32),
        b9.reshape(9 * C, 1).astype(jnp.float32),
        at_rows,
    )


def _bwd_call(feat, cb, w0, b0, w1, b1, extras, mode, interpret):
    B, H, C, W = feat.shape
    Cm = w0.shape[1]
    R = _pick_rows(H)
    G = H // R
    cb8, w0p, b0c, w1t, b1c = _prep(feat, cb, w0, b0, w1, b1)
    f_spec, c_spec, vec, mat, scratch = _common_specs(R, G, C, W, feat.dtype)
    scratch = scratch + [pltpu.VMEM((2 * R + 2, C, W), jnp.float32)]
    dfeat_spec = pl.BlockSpec(
        (1, R, C, W), lambda b, g: (b, jnp.maximum(g - 2, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    mlp_specs = (mat(8, Cm), vec(Cm), mat(C, Cm), vec(C))
    mlp_shapes = (
        jax.ShapeDtypeStruct((8, Cm), jnp.float32),
        jax.ShapeDtypeStruct((Cm, 1), jnp.float32),
        jax.ShapeDtypeStruct((C, Cm), jnp.float32),
        jax.ShapeDtypeStruct((C, 1), jnp.float32),
    )
    if mode == "agg":
        s9, b9, agg, gy = extras
        Co = agg.shape[1]
        at_rows = jnp.transpose(
            agg.reshape(9, C, Co), (0, 2, 1)
        ).reshape(9 * Co, C).astype(jnp.float32)
        a_rows = agg.astype(jnp.float32)  # (9C, Co)
        gy_spec = pl.BlockSpec(
            (1, R, Co, W), lambda b, g: (b, jnp.minimum(
                jnp.maximum(g - 1, 0), G - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            f_spec, c_spec, mat(8, Cm), vec(Cm), mat(C, Cm), vec(C),
            vec(9 * C), vec(9 * C), mat(9 * C, Co), mat(9 * Co, C), gy_spec,
        ]
        operands = [
            feat, cb8, w0p, b0c, w1t, b1c,
            s9.reshape(9 * C, 1).astype(jnp.float32),
            b9.reshape(9 * C, 1).astype(jnp.float32),
            a_rows, at_rows, gy,
        ]
        out_specs = (
            dfeat_spec, mat(9 * C, Co), vec(9 * C), vec(9 * C)
        ) + mlp_specs
        out_shape = (
            jax.ShapeDtypeStruct((B, H, C, W), feat.dtype),
            jax.ShapeDtypeStruct((9 * C, Co), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, 1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C, 1), jnp.float32),
        ) + mlp_shapes
    else:
        c1, c2 = extras
        in_specs = [
            f_spec, c_spec, mat(8, Cm), vec(Cm), mat(C, Cm), vec(C),
            vec(9 * C), vec(9 * C),
        ]
        operands = [
            feat, cb8, w0p, b0c, w1t, b1c,
            c1.reshape(9 * C, 1).astype(jnp.float32),
            c2.reshape(9 * C, 1).astype(jnp.float32),
        ]
        out_specs = (dfeat_spec,) + mlp_specs
        out_shape = (
            jax.ShapeDtypeStruct((B, H, C, W), feat.dtype),
        ) + mlp_shapes
    Co = extras[2].shape[1] if mode == "agg" else 0
    kern = functools.partial(
        _bwd_kernel, R=R, G=G, C=C, Cm=Cm, Co=Co, W=W, mode=mode
    )
    return pl.pallas_call(
        kern,
        grid=(B, G + 2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _unpack_mlp(dw0p, db0c, dw1t, db1c):
    return dw0p[:3], db0c[:, 0], jnp.transpose(dw1t), db1c[:, 0]


# =============================================================================
# custom-vjp ops
# =============================================================================
@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def meta_stats_bhcw(feat, cb, w0, b0, w1, b1, interpret=False):
    """Pass A as a differentiable op: (s1, s2) of the 9C tap channels."""
    return meta_stats_pallas(feat, cb, w0, b0, w1, b1, interpret)


def _stats_fwd(feat, cb, w0, b0, w1, b1, interpret):
    out = meta_stats_pallas(feat, cb, w0, b0, w1, b1, interpret)
    return out, (feat, cb, w0, b0, w1, b1)


def _stats_bwd(interpret, res, ct):
    feat, cb, w0, b0, w1, b1 = res
    ds1, ds2 = ct
    # da/d(sums): da[j, p] = ds1[j] + 2·ds2[j]·a[j, p]
    # ds2 also needs Σa per channel? No: d(Σa²)/da = 2a — all elementwise.
    dfeat, dw0p, db0c, dw1t, db1c = _bwd_call(
        feat, cb, w0, b0, w1, b1, (ds1, 2.0 * ds2), "stats", interpret
    )
    dw0, db0, dw1, db1 = _unpack_mlp(dw0p, db0c, dw1t, db1c)
    return dfeat, jnp.zeros_like(cb), dw0, db0, dw1, db1


meta_stats_bhcw.defvjp(_stats_fwd, _stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def meta_agg_bhcw(feat, cb, w0, b0, w1, b1, s9, b9, agg, interpret=False):
    """Pass B as a differentiable op: the fused block output (B, H, Co, W)."""
    return meta_agg_pallas(feat, cb, w0, b0, w1, b1, s9, b9, agg, interpret)


def _agg_fwd(feat, cb, w0, b0, w1, b1, s9, b9, agg, interpret):
    out = meta_agg_pallas(feat, cb, w0, b0, w1, b1, s9, b9, agg, interpret)
    return out, (feat, cb, w0, b0, w1, b1, s9, b9, agg)


def _agg_bwd(interpret, res, gy):
    feat, cb, w0, b0, w1, b1, s9, b9, agg = res
    (dfeat, dA, ds9, db9, dw0p, db0c, dw1t, db1c) = _bwd_call(
        feat, cb, w0, b0, w1, b1, (s9, b9, agg, gy), "agg", interpret
    )
    dw0, db0, dw1, db1 = _unpack_mlp(dw0p, db0c, dw1t, db1c)
    return (
        dfeat, jnp.zeros_like(cb), dw0, db0, dw1, db1,
        ds9[:, 0], db9[:, 0], dA,
    )


meta_agg_bhcw.defvjp(_agg_fwd, _agg_bwd)
