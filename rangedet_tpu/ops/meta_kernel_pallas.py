"""Fused Meta-Kernel as a Pallas TPU kernel.

Computes, in ONE kernel pass per (batch, width-tile) grid step:

  rel[t]  = coords[p + offset_t] - coords[p]            (3x3 taps, zero pad)
  w[t]    = MLP(rel[t])  (3 -> C_mid -> C, fc-relu-fc)  per-pixel dyn weights
  out[p, t*C:(t+1)*C] = feat[p + offset_t] * w[t]

The pure-XLA formulation (models/meta_kernel.py, the numerical oracle)
materializes three (B, H, W, 9C) tensors in HBM (neighbors, weights, product
≈ 1.1 GB at full size); this kernel keeps all intermediates in VMEM and only
writes the product once. The first MLP layer is algebraically expanded into 3
scalar-vector broadcasts (contraction dim is 3 — useless for the MXU); the
second layer is a real MXU matmul per tap.

Replaces the compute of reference meta_baseline_bias
(rangedet/symbol/backbone/meta_kernel.py:166-240).

Training: ``meta_kernel_fused`` carries a custom VJP whose backward pass is
the VJP of the XLA formulation (numerically the same function), so the op is
usable under jax.grad. Measured on v5e at the model's shapes (B2 64×2656×64)
the XLA oracle forward is actually *faster* than this kernel (4.0 ms vs
8.0 ms — the op is HBM-write-bound on its (B, H, W, 9C) output, which XLA
streams just as well), so shipped recipes keep ``use_pallas_meta=False``;
the kernel remains for narrow-VMEM regimes and as the fused-path reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFSETS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _kernel(w0_ref, b0_ref, w1_ref, b1_ref, feat_hbm, coord_hbm, out_ref,
            feat_slab, coord_slab, sems, *, H, Wt, C, C_mid):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # slab width Wt+8: Mosaic requires DMA slice sizes aligned to the 8-wide
    # sublane tiling of the (W, C) dims; cols [Wt+2, Wt+8) are junk padding
    feat_dma = pltpu.make_async_copy(
        feat_hbm.at[b, :, pl.ds(i * Wt, Wt + 8), :], feat_slab, sems.at[0]
    )
    coord_dma = pltpu.make_async_copy(
        coord_hbm.at[b, :, pl.ds(i * Wt, Wt + 8), :], coord_slab, sems.at[1]
    )
    feat_dma.start()
    coord_dma.start()
    coord_dma.wait()
    feat_dma.wait()

    center = coord_slab[1 : H + 1, 1 : Wt + 1, :3]  # (H, Wt, 3)
    w0 = w0_ref[:]  # (3, C_mid)
    b0 = b0_ref[:]  # (C_mid,)
    w1 = w1_ref[:]  # (C_mid, C)
    b1 = b1_ref[:]  # (C,)

    for t, (dy, dx) in enumerate(_OFFSETS):
        rel = (
            coord_slab[dy : dy + H, dx : dx + Wt, :3] - center
        )  # (H, Wt, 3)
        # first MLP layer as 3 broadcasts (K=3 is not MXU work)
        h = (
            rel[:, :, 0:1] * w0[0][None, None, :]
            + rel[:, :, 1:2] * w0[1][None, None, :]
            + rel[:, :, 2:3] * w0[2][None, None, :]
            + b0[None, None, :]
        )
        h = jnp.maximum(h, 0.0)  # (H, Wt, C_mid)
        w = (
            jnp.dot(
                h.reshape(H * Wt, C_mid),
                w1,
                preferred_element_type=jnp.float32,
            )
            + b1[None, :]
        ).reshape(H, Wt, C)
        nb = feat_slab[dy : dy + H, dx : dx + Wt, :C]  # (H, Wt, C)
        out_ref[0, :, :, t * C : (t + 1) * C] = (
            nb.astype(jnp.float32) * w
        ).astype(out_ref.dtype)


def _meta_oracle(feat, coords, w0, b0, w1, b1):
    """The XLA formulation (same math as models/meta_kernel.py's path):
    used as the numerical twin for the kernel's backward pass."""
    from ..models.layers import extract_patches_3x3

    B, H, W, C = feat.shape
    dtype = feat.dtype
    coords = coords.astype(dtype)
    nb_coords = extract_patches_3x3(coords)
    rel = nb_coords - coords[:, :, :, None, :]
    h = jnp.maximum(rel @ w0.astype(dtype) + b0.astype(dtype), 0.0)
    w = h @ w1.astype(dtype) + b1.astype(dtype)
    nb_feat = extract_patches_3x3(feat)
    return (nb_feat * w).reshape(B, H, W, 9 * C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def meta_kernel_fused(
    feat: jnp.ndarray,
    coords: jnp.ndarray,
    w0: jnp.ndarray,
    b0: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    return _meta_kernel_fused_impl(
        feat, coords, w0, b0, w1, b1, w_tile, interpret
    )


def _meta_vjp_fwd(feat, coords, w0, b0, w1, b1, w_tile, interpret):
    out = _meta_kernel_fused_impl(
        feat, coords, w0, b0, w1, b1, w_tile, interpret
    )
    return out, (feat, coords, w0, b0, w1, b1)


def _meta_vjp_bwd(w_tile, interpret, res, gy):
    # backward through the numerically-equivalent XLA formulation: the
    # kernel's value IS _meta_oracle's value (tested), so its VJP is exact
    _, vjp = jax.vjp(_meta_oracle, *res)
    return vjp(gy)


meta_kernel_fused.defvjp(_meta_vjp_fwd, _meta_vjp_bwd)


def _meta_kernel_fused_impl(
    feat: jnp.ndarray,
    coords: jnp.ndarray,
    w0: jnp.ndarray,
    b0: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """feat (B,H,W,C), coords (B,H,W,3), MLP params -> (B,H,W,9C).

    Numerically equivalent to models/meta_kernel.MetaKernel's XLA path
    (tested against it); W is internally padded to a multiple of ``w_tile``.
    """
    B, H, W, C = feat.shape
    C_mid = w0.shape[1]
    dtype = feat.dtype

    Wp = -(-W // w_tile) * w_tile
    # +1 halo each side of H/W (zero padding reproduces im2col pad=1), plus 6
    # extra right-pad columns so every 8-aligned DMA slab stays in bounds;
    # channels pad to the 128-lane tile (HBM slices must take whole tiles)
    Cp = -(-C // 128) * 128
    feat_p = jnp.pad(feat, ((0, 0), (1, 1), (1, 7 + Wp - W), (0, Cp - C)))
    coord_p = jnp.pad(
        coords.astype(dtype), ((0, 0), (1, 1), (1, 7 + Wp - W), (0, 125))
    )

    grid = (B, Wp // w_tile)
    kernel = functools.partial(_kernel, H=H, Wt=w_tile, C=C, C_mid=C_mid)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.ANY),  # feat (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # coords (HBM)
        ],
        out_specs=pl.BlockSpec(
            (1, H, w_tile, 9 * C),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Wp, 9 * C), dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, w_tile + 8, -(-C // 128) * 128), dtype),
            pltpu.VMEM((H + 2, w_tile + 8, 128), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        w0.astype(dtype), b0.astype(dtype), w1.astype(dtype), b1.astype(dtype),
        feat_p, coord_p,
    )
    return out[:, :, :W, :]
