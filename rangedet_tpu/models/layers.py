"""Small conv building blocks (Flax, NHWC channels-last — the TPU layout).

Replaces the reference's mxnext symbol wrappers (mxnext/simple.py:123-580,
mxnext/complicate.py:14-149): Flax *is* the wrapper, so only the fused
conv-norm-relu combinators live here.

Mixed precision: convs compute in ``dtype`` (bf16 by default on TPU) with fp32
parameters; BatchNorm statistics are always computed in fp32 (the reference
similarly keeps BN in fp16-safe mode and casts head logits back to fp32,
rangedet/symbol/head/builder.py:257-261).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv_pallas import (
    _pick_rows_per_step,
    conv3x3_bnrelu_bhcw,
    conv3x3_bnrelu_stats_bhcw,
    conv3x3_stats_bhcw,
)
from ..ops.conv_pallas import conv3x3_bhcw as conv3x3_pallas

Dtype = Any

PLANAR_LAYOUTS = ("planar", "bhcw")  # channel-major / channel-sublane


class PendingBN(NamedTuple):
    """A conv output with its BatchNorm apply + relu *deferred*: the consumer
    conv fuses ``relu(y*scale+bias)`` into its VMEM ingest
    (ops/conv_pallas.py:conv3x3_bnrelu_bhcw), so the activated tensor never
    round-trips HBM. bhcw layout only; ``scale``/``bias`` are the f32 BN fold.
    """

    y: jnp.ndarray      # raw conv output (B, H, C, W)
    scale: jnp.ndarray  # f32 (C,)
    bias: jnp.ndarray   # f32 (C,)

    def materialize(self) -> jnp.ndarray:
        return _bn_relu_mat(self.y, self.scale, self.bias)


@jax.custom_vjp
def _bn_relu_mat(y, scale, bias):
    yf = y.astype(jnp.float32)
    a = yf * scale[None, None, :, None]
    a = a + bias[None, None, :, None]
    return jnp.maximum(a, 0.0).astype(y.dtype)


def _bn_relu_mat_fwd(y, scale, bias):
    return _bn_relu_mat(y, scale, bias), (y, scale, bias)


def _bn_relu_mat_bwd(res, g):
    """Backward with every full-size intermediate kept in ``y.dtype``.

    Plain autodiff of materialize() runs the relu/affine backward in f32,
    which makes XLA materialize the consumer's dgrad output (e.g. the head
    1x1's [B,H,W,128] cotangent) as f32 plus a same-size layout copy —
    ~2x the HBM traffic of the bf16 tensors the chain actually needs
    (r5 device trace, BENCH.md). Here the big cotangent stays bf16: the
    f32 math happens only inside the two fused computations (dy element-
    wise; dscale/dbias reductions), never as a materialized tensor. The
    forward value is bit-identical; dy differs from the f32-elementwise
    form only by one bf16 rounding of (g*scale).
    """
    y, scale, bias = res
    sb = scale[None, None, :, None]
    yf = y.astype(jnp.float32)
    pos = yf * sb + bias[None, None, :, None] > 0.0
    gz = jnp.where(pos, g, jnp.zeros_like(g))          # y.dtype
    dy = (gz.astype(jnp.float32) * sb).astype(y.dtype)
    gzf = gz.astype(jnp.float32)
    dscale = jnp.sum(gzf * yf, axis=(0, 1, 3))
    dbias = jnp.sum(gzf, axis=(0, 1, 3))
    return dy, dscale, dbias


_bn_relu_mat.defvjp(_bn_relu_mat_fwd, _bn_relu_mat_bwd)


MaybePending = Union[jnp.ndarray, PendingBN]


def materialize(x: MaybePending) -> jnp.ndarray:
    return x.materialize() if isinstance(x, PendingBN) else x


def channel_axis_of(layout: str) -> int:
    return {"planar": 1, "bhcw": 2}.get(layout, -1)

BN_MOMENTUM = 0.9  # MXNet BatchNorm default, used by all reference configs
BN_EPSILON = 1e-3


class BatchNorm(nn.Module):
    """Mixed-precision BatchNorm: statistics accumulate in fp32 (reductions
    upcast inside the fusion — no fp32 copy of the activation is ever
    materialized, which matters for the 576-channel Meta-Kernel tensor), and
    normalization runs elementwise in the compute dtype.

    Under GSPMD data sharding the stat reductions become global (sync-BN
    semantics); the reference uses per-GPU localbn + epoch-end aux averaging
    (mxnext/complicate.py:55-66, utils/detection_module.py:1164-1170).
    """

    use_running_average: bool
    dtype: Dtype = jnp.float32
    channel_axis: int = -1  # -1 for NHWC, 1 for planar (B, C, H, W)
    # affine_out: return PendingBN(x, fold_scale, fold_bias) instead of the
    # normalized tensor — the consumer fuses apply+relu (bhcw only)
    affine_out: bool = False
    # sync_axis: psum the statistic sums over this (bound) mesh axis —
    # exact sync-BN inside shard_map, where per-shard Pallas kernels run
    # (GSPMD's implicit global reductions don't apply under manual sharding)
    sync_axis: Any = None

    @nn.compact
    def __call__(self, x, sums=None):
        """sums: optional per-channel (Σx, Σx²) computed by the producer
        kernel (ops/conv_pallas.py stats outputs) — the statistics pass over
        the tensor is then skipped entirely."""
        ch_axis = self.channel_axis % x.ndim
        C = x.shape[ch_axis]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        axes = tuple(a for a in range(x.ndim) if a != ch_axis)
        sync = self.sync_axis if not self.is_initializing() else None
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = 1
            for a in axes:
                n *= x.shape[a]
            if sums is not None:
                s1, s2 = sums
            elif sync is not None:
                xf = x.astype(jnp.float32)
                s1 = jnp.sum(xf, axis=axes)
                s2 = jnp.sum(jnp.square(xf), axis=axes)
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=axes)
                var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if sums is not None or sync is not None:
                if sync is not None:
                    s1 = jax.lax.psum(s1, sync)
                    s2 = jax.lax.psum(s2, sync)
                    n = n * jax.lax.psum(1, sync)
                mean = s1 / n
                var = s2 / n - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value + (1 - BN_MOMENTUM) * var

        inv = jax.lax.rsqrt(var + BN_EPSILON) * scale
        if self.affine_out:
            assert ch_axis == 2, "PendingBN is bhcw-only (channel axis 2)"
            return PendingBN(x.astype(self.dtype), inv, bias - mean * inv)
        shape = [1] * x.ndim
        shape[ch_axis] = C
        mul = inv.astype(self.dtype).reshape(shape)
        add = (bias - mean * inv).astype(self.dtype).reshape(shape)
        return x.astype(self.dtype) * mul + add


class BatchNormFold(nn.Module):
    """BatchNorm that consumes per-channel sums directly and returns only
    the f32 fold (scale, bias) — for ops that apply the normalization
    inside a kernel without materializing the tensor (the fused Meta-Kernel
    block, ops/meta_block_pallas.py). Parameter/stat names match BatchNorm
    exactly, so checkpoints are interchangeable with the unfused path.
    """

    use_running_average: bool
    sync_axis: Any = None

    @nn.compact
    def __call__(self, s1, s2, count):
        C = s1.shape[0]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        sync = self.sync_axis if not self.is_initializing() else None
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = count
            if sync is not None:
                s1 = jax.lax.psum(s1, sync)
                s2 = jax.lax.psum(s2, sync)
                n = n * jax.lax.psum(1, sync)
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean
                )
                ra_var.value = (
                    BN_MOMENTUM * ra_var.value + (1 - BN_MOMENTUM) * var
                )
        inv = jax.lax.rsqrt(var + BN_EPSILON) * scale
        return inv, bias - mean * inv


def conv3x3_planar_core(
    xp: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1
) -> jnp.ndarray:
    """3x3 SAME conv as 9 shifted channel-matmuls on planar (B, C, H, W)
    input. Numerically identical to nn.Conv(padding='SAME') in NHWC.

    The v5e conv emitter sustains only ~8 TF/s fwd+bwd on the 64-channel
    full-width range-image stages; this formulation reaches ~15 TF/s, and a
    fully-planar block (BN over axis 1) keeps the gain end-to-end.
    """
    B, Ci, H, W = xp.shape
    if stride_w == 1:
        xq = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, 1)))
        Wo = W
    else:
        # SAME for stride 2, kernel 3: pad (0, 1) on W
        xq = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 1)))
        Wo = -(-W // stride_w)
    out = None
    for dy in range(3):
        for dx in range(3):
            if stride_w == 1:
                sh = jax.lax.dynamic_slice(xq, (0, 0, dy, dx), (B, Ci, H, W))
            else:
                sh = jax.lax.slice(
                    xq, (0, 0, dy, dx),
                    (B, Ci, dy + H, dx + 1 + (Wo - 1) * stride_w),
                    (1, 1, 1, stride_w),
                )
            o = jnp.einsum(
                "bihw,io->bohw", sh, kernel[dy, dx],
                preferred_element_type=xp.dtype,
            )
            out = o if out is None else out + o
    return out


def conv1x1_planar(xp: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1
                   ) -> jnp.ndarray:
    """1x1 conv on planar input: one channel matmul; kernel (C_in, C_out)."""
    if stride_w != 1:
        xp = xp[:, :, :, ::stride_w]
    return jnp.einsum("bihw,io->bohw", xp, kernel,
                      preferred_element_type=xp.dtype)


def conv3x3_planar(
    x: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1
) -> jnp.ndarray:
    """NHWC-wrapped planar conv (transposes in/out); see conv3x3_planar_core."""
    xp = jnp.transpose(x, (0, 3, 1, 2))
    out = conv3x3_planar_core(xp, kernel, stride_w)
    return jnp.transpose(out, (0, 2, 3, 1))


# --------------------------------------------------------------------- bhcw
# layout="bhcw" keeps channels in sublanes and the range-image width in
# lanes — the layout of the Pallas conv kernels (ops/conv_pallas.py). The
# XLA forms below are the stride-2 / CPU fallbacks with identical numerics.

def conv3x3_bhcw_xla(
    xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1
) -> jnp.ndarray:
    """3x3 SAME conv on (B, H, C, W) as 9 shifted channel-matmuls."""
    B, H, Ci, W = xb.shape
    if stride_w == 1:
        xq = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (1, 1)))
        Wo = W
    else:
        xq = jnp.pad(xb, ((0, 0), (1, 1), (0, 0), (0, 1)))
        Wo = -(-W // stride_w)
    out = None
    for dy in range(3):
        for dx in range(3):
            if stride_w == 1:
                sh = jax.lax.dynamic_slice(xq, (0, dy, 0, dx), (B, H, Ci, W))
            else:
                sh = jax.lax.slice(
                    xq, (0, dy, 0, dx),
                    (B, dy + H, Ci, dx + 1 + (Wo - 1) * stride_w),
                    (1, 1, 1, stride_w),
                )
            o = jnp.einsum(
                "bhiw,io->bhow", sh, kernel[dy, dx],
                preferred_element_type=xb.dtype,
            )
            out = o if out is None else out + o
    return out


def _axis_size_static(axis_name) -> int:
    """Static size of a bound shard_map/pmap mesh axis."""
    try:
        return int(jax.lax.axis_size(axis_name))
    except AttributeError:  # older jax: look up the frame's axis env
        from jax.core import get_axis_env  # type: ignore

        return int(get_axis_env().axis_size(axis_name))


def width_halo_exchange(x: jnp.ndarray, axis_name, h: int = 1) -> jnp.ndarray:
    """(…, W_local) -> (…, W_local + 2h): prepend/append the h edge columns
    of the neighboring width shards via two ``ppermute``s over ``axis_name``.

    The first/last shards receive ZEROS for the missing neighbor (ppermute's
    semantics for un-addressed destinations) — exactly the global SAME zero
    padding, so "exchange → run the zero-padded op → slice h (or stride·h)
    output columns" reproduces the unsharded op bit-for-bit on the interior.
    This is the manual-sharding analogue of the conv halo exchanges GSPMD
    inserts automatically, and it is what lets the Pallas conv kernels (which
    cannot ride the GSPMD partitioner) compose with a width-sharded mesh.
    """
    n = _axis_size_static(axis_name)
    if n == 1:
        pad = [(0, 0)] * (x.ndim - 1) + [(h, h)]
        return jnp.pad(x, pad)
    left = jax.lax.ppermute(
        x[..., -h:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    right = jax.lax.ppermute(
        x[..., :h], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([left, x, right], axis=-1)


def conv3x3_stride2_phase(
    xb: jnp.ndarray, kernel: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """SAME stride-(1,2) 3x3 conv as a PHASE-PACKED stride-1 Pallas conv.

    With E[u] = x[2u], O[u] = x[2u+1] (even/odd lane phases), the strided
    conv (SAME pads (0,1) for even W) is exactly

        y[u] = w[:,0]·E[u] + w[:,1]·O[u] + w[:,2]·E[u+1]

    i.e. a stride-1 3x3 conv over the channel-stacked [E;O] input with the
    packed kernel  w'[:,1] = [w[:,0]; w[:,1]],  w'[:,2] = [w[:,2]; 0],
    w'[:,0] = 0 — the right-edge zero pad of the packed conv reproduces the
    strided conv's x[W] pad. This reuses the tested fwd/dgrad/wgrad Pallas
    suite (custom VJP included) instead of the native lax.conv emitter,
    which sustains only ~7 TF/s on these shapes (profiled; BENCH.md r3).
    """
    B, H, Ci, W = xb.shape
    Co = kernel.shape[-1]
    x2 = jnp.concatenate(
        [xb[..., 0::2], xb[..., 1::2]], axis=2
    )  # (B, H, 2Ci, W/2)
    kp = jnp.zeros((3, 3, 2 * Ci, Co), kernel.dtype)
    kp = kp.at[:, 1, :Ci].set(kernel[:, 0])
    kp = kp.at[:, 1, Ci:].set(kernel[:, 1])
    kp = kp.at[:, 2, :Ci].set(kernel[:, 2])
    return conv3x3_pallas(x2, kp, None, interpret)


def conv3x3_bhcw_best(
    xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel for stride-1 on TPU; phase-packed Pallas for
    stride 2 (see conv3x3_stride2_phase; the native lax.conv emitter manages
    ~7 TF/s there); the shifted-einsum form is the CPU/interpret fallback."""
    pallas_ok = (
        use_pallas
        and jax.default_backend() == "tpu"
        and xb.shape[1] % _pick_rows_per_step(xb.shape[2], xb.shape[1]) == 0
    )
    if stride_w == 1:
        if pallas_ok:
            return conv3x3_pallas(xb, kernel)
        return conv3x3_bhcw_xla(xb, kernel, stride_w)
    if pallas_ok and stride_w == 2 and xb.shape[3] % 2 == 0:
        return conv3x3_stride2_phase(xb, kernel)
    if jax.default_backend() == "tpu":
        return jax.lax.conv_general_dilated(
            xb, kernel, (1, stride_w), "SAME",
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
        )
    return conv3x3_bhcw_xla(xb, kernel, stride_w)


def conv3x3_bhcw_consume(
    x: MaybePending, kernel: jnp.ndarray, stride_w: int = 1,
    use_pallas: bool = True, want_stats: bool = False,
):
    """conv3x3_bhcw_best that additionally fuses a PendingBN input's BN
    apply + relu into the Pallas kernel ingest when available, and (with
    ``want_stats``) accumulates this conv's BatchNorm sums in-kernel.

    Returns (y, sums): sums is (Σy, Σy²) per channel, or None when the
    fallback path ran (the caller's BN then computes stats itself)."""
    pallas_ok = (
        stride_w == 1
        and use_pallas
        and jax.default_backend() == "tpu"
    )
    if isinstance(x, PendingBN):
        h, c = x.y.shape[1], x.y.shape[2]
        if pallas_ok and h % _pick_rows_per_step(c, h) == 0:
            if want_stats:
                y, s1, s2 = conv3x3_bnrelu_stats_bhcw(
                    x.y, kernel, x.scale, x.bias
                )
                return y, (s1, s2)
            return conv3x3_bnrelu_bhcw(x.y, kernel, x.scale, x.bias), None
        if (
            stride_w == 2
            and use_pallas
            and jax.default_backend() == "tpu"
            and x.y.shape[3] % 2 == 0
            and h % _pick_rows_per_step(2 * c, h) == 0
        ):
            # phase-packed strided conv keeps the producer-BN ingest fusion:
            # the even/odd phases carry the same channels, so the per-channel
            # fold simply tiles (see conv3x3_stride2_phase)
            Ci, Co = c, kernel.shape[-1]
            x2 = jnp.concatenate(
                [x.y[..., 0::2], x.y[..., 1::2]], axis=2
            )
            kp = jnp.zeros((3, 3, 2 * Ci, Co), kernel.dtype)
            kp = kp.at[:, 1, :Ci].set(kernel[:, 0])
            kp = kp.at[:, 1, Ci:].set(kernel[:, 1])
            kp = kp.at[:, 2, :Ci].set(kernel[:, 2])
            s2x = jnp.concatenate([x.scale, x.scale])
            b2x = jnp.concatenate([x.bias, x.bias])
            if want_stats:
                y, s1, s2 = conv3x3_bnrelu_stats_bhcw(x2, kp, s2x, b2x)
                return y, (s1, s2)
            return conv3x3_bnrelu_bhcw(x2, kp, s2x, b2x), None
        x = x.materialize()
    if (
        pallas_ok
        and want_stats
        and x.shape[1] % _pick_rows_per_step(x.shape[2], x.shape[1]) == 0
    ):
        y, s1, s2 = conv3x3_stats_bhcw(x, kernel)
        return y, (s1, s2)
    return conv3x3_bhcw_best(x, kernel, stride_w, use_pallas), None


def conv3x3_bhcw_width_sharded(
    x: MaybePending, kernel: jnp.ndarray, stride_w: int, use_pallas: bool,
    width_axis,
):
    """3x3 conv on a width shard: exchange halos over ``width_axis``, run the
    unmodified (zero-padding) conv on the extended slice, slice the interior
    — bit-identical to the unsharded op (its own zero pad only touches the
    sliced-away columns; the global edge shards receive genuine zeros from
    ppermute).

    stride 1: 1-col halo each side, slice [1:-1].
    stride 2 (XLA SAME pads left 0 / right 1 for even W): a single RIGHT
    halo column + VALID conv — the output is already exact.

    A PendingBN input is MATERIALIZED before the exchange: the halo must
    live in the activated domain (the global edge shards receive ppermute
    zeros, and the unsharded kernels' SAME padding is zero *post*-activation
    — exchanging raw values would turn those pad columns into relu(bias)).
    Width-sharded meshes therefore trade the producer-BN ingest fusion for
    exactness. In-kernel BN stats are never requested here either (they
    would count the halo columns); the consumer BN computes stats on the
    exact-width tensor and psums them over the mesh axes.
    """
    if isinstance(x, PendingBN):
        x = x.materialize()
    if stride_w == 1:
        x = width_halo_exchange(x, width_axis)
        y, _ = conv3x3_bhcw_consume(x, kernel, 1, use_pallas,
                                    want_stats=False)
        return y[..., 1:-1]
    n = _axis_size_static(width_axis)
    if n == 1:
        right = jnp.zeros_like(x[..., :1])
    else:
        right = jax.lax.ppermute(
            x[..., :1], width_axis, [(i + 1, i) for i in range(n - 1)]
        )
    x_ext = jnp.concatenate([x, right], axis=-1)
    return jax.lax.conv_general_dilated(
        x_ext, kernel, (1, stride_w),
        padding=((1, 1), (0, 0)),  # vertical SAME, horizontal VALID
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
    )


def conv1x1_bhcw(xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int = 1
                 ) -> jnp.ndarray:
    """1x1 conv on (B, H, C, W); kernel (C_in, C_out)."""
    if stride_w != 1 and jax.default_backend() == "tpu":
        # native conv handles the strided lane subsample + matmul in one op
        # (a ::stride lane slice before einsum is slow on v5e)
        return jax.lax.conv_general_dilated(
            xb, kernel[None, None], (1, stride_w), "VALID",
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
        )
    if stride_w != 1:
        xb = xb[:, :, :, ::stride_w]
    return jnp.einsum("bhiw,io->bhow", xb, kernel,
                      preferred_element_type=xb.dtype)


def deconv_bhcw(
    xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int
) -> jnp.ndarray:
    """Phase-decomposed SAME transposed conv on (B, H, C, W) — the
    (B, C, H, W) form of deconv_planar with identical numerics."""
    B, H, Ci, W = xb.shape
    kh, kw, _, Co = kernel.shape
    s = stride_w
    assert kw % s == 0, (kw, s)
    pad = (kw - s) // 2
    J = kw // s
    pad_h = (kh - 1) // 2
    xq = jnp.pad(xb, ((0, 0), (pad_h, pad_h), (0, 0), (J + 2, J + 2)))
    phases = []
    for p in range(s):
        k0 = (p + pad) % s
        D = (p + pad - k0) // s
        acc = None
        for dy in range(kh):
            hoff = pad_h + pad_h - dy
            for j in range(J):
                k_idx = k0 + j * s
                kk = kernel[kh - 1 - dy, kw - 1 - k_idx]
                moff = J + 2 + D - j
                sh = jax.lax.dynamic_slice(
                    xq, (0, hoff, 0, moff), (B, H, Ci, W)
                )
                o = jnp.einsum(
                    "bhiw,io->bhow", sh, kk, preferred_element_type=xb.dtype
                )
                acc = o if acc is None else acc + o
        phases.append(acc)
    out = jnp.stack(phases, axis=-1)  # (B, H, Co, W, s)
    return out.reshape(B, H, Co, W * s)


def deconv_bhcw_phase_conv(
    xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME transposed conv (kh=3, kw=2s) as ONE phase-packed stride-1
    Pallas conv at the LOW resolution + a lane interleave.

    Each output phase p (columns p, p+s, …) of the deconv is a (3 × 2)-tap
    convolution of the input whose column offsets lie in {-1, 0, +1}, so all
    s phases pack into a single 3x3 conv with output channels s·Co:

        y2 = conv3x3(x, Kp),  Kp[dy, off+1, :, p·Co:(p+1)·Co] = k[dy, kw-1-k_idx]

    (offsets/taps from the phase decomposition of deconv_bhcw; the conv's
    SAME zero pad reproduces the deconv's out-of-range zeros). This rides
    the tested Pallas conv suite — incl. its custom VJP; the kernel packing
    and the interleave are differentiable, so gradients need no extra work.
    Covers both shipped agg deconvs, (3,8)/s4 and (3,4)/s2
    (reference dla_backbone.py:144-151).
    """
    B, H, Ci, W = xb.shape
    kh, kw, _, Co = kernel.shape
    s = stride_w
    assert kh == 3 and kw == 2 * s, (kh, kw, s)
    pad = (kw - s) // 2
    J = kw // s
    kp = jnp.zeros((3, 3, Ci, s * Co), kernel.dtype)
    for p in range(s):
        k0 = (p + pad) % s
        D = (p + pad - k0) // s
        for j in range(J):
            k_idx = k0 + j * s
            off = D - j
            assert -1 <= off <= 1, (p, j, off)
            kp = kp.at[:, off + 1, :, p * Co : (p + 1) * Co].set(
                kernel[:, kw - 1 - k_idx]
            )
    y2 = conv3x3_pallas(xb, kp, None, interpret)  # (B, H, s*Co, W)
    y2 = y2.reshape(B, H, s, Co, W)
    return jnp.transpose(y2, (0, 1, 3, 4, 2)).reshape(B, H, Co, W * s)


def deconv_bhcw_best(
    xb: jnp.ndarray, kernel: jnp.ndarray, stride_w: int,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Dispatch: phase-packed Pallas form on TPU (kh=3, kw=2s shapes — all
    shipped recipes), phase-decomposed einsums otherwise."""
    kh, kw = kernel.shape[:2]
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and kh == 3
        and kw == 2 * stride_w
        and xb.shape[1] % _pick_rows_per_step(xb.shape[2], xb.shape[1]) == 0
    ):
        return deconv_bhcw_phase_conv(xb, kernel, stride_w)
    return deconv_bhcw(xb, kernel, stride_w)


def deconv_planar(
    xp: jnp.ndarray, kernel: jnp.ndarray, stride_w: int
) -> jnp.ndarray:
    """Transposed conv with stride (1, s) and SAME padding on planar
    (B, C, H, W) input as *phase-decomposed* stride-1 channel-matmuls: output
    phase p (columns p, p+s, ...) is a small (kh × kw/s)-tap conv of the
    input, so the whole deconv is kh·kw shifted matmuls plus an interleave —
    no zero-dilated input, no NHWC transposes. Numerically identical to
    nn.ConvTranspose(padding='SAME') (kernel (kh, kw, C_in, C_out); the
    transposed conv correlates with the *flipped* kernel).

    Covers the reference's agg deconvs (3,8)/s4 and (3,4)/s2
    (dla_backbone.py:144-151).
    """
    B, Ci, H, W = xp.shape
    kh, kw, _, Co = kernel.shape
    s = stride_w
    assert kw % s == 0, (kw, s)
    pad = (kw - s) // 2
    J = kw // s
    pad_h = (kh - 1) // 2
    xq = jnp.pad(xp, ((0, 0), (0, 0), (pad_h, pad_h), (J + 2, J + 2)))
    phases = []
    for p in range(s):
        k0 = (p + pad) % s
        D = (p + pad - k0) // s
        acc = None
        for dy in range(kh):
            hoff = pad_h + pad_h - dy
            for j in range(J):
                k_idx = k0 + j * s
                kk = kernel[kh - 1 - dy, kw - 1 - k_idx]
                moff = J + 2 + D - j
                sh = jax.lax.dynamic_slice(
                    xq, (0, 0, hoff, moff), (B, Ci, H, W)
                )
                o = jnp.einsum(
                    "bihw,io->bohw", sh, kk, preferred_element_type=xp.dtype
                )
                acc = o if acc is None else acc + o
        phases.append(acc)
    out = jnp.stack(phases, axis=-1)  # (B, Co, H, W, s)
    return out.reshape(B, Co, H, W * s)


class ConvNormRelu(nn.Module):
    """3x3 (default) conv + BN + relu, the basic unit of backbone and head.

    layout="planar" takes/returns (B, C, H, W) and runs the conv as shifted
    channel-matmuls with BN over axis 1 — ~1.8× faster fwd+bwd than the NHWC
    conv emitter at the model's channel widths on v5e (BENCH.md).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    layout: str = "nhwc"  # or "planar" / "bhcw"
    use_pallas: bool = True  # bhcw only: Pallas conv kernel on TPU
    # emit_pending (bhcw): return PendingBN — defer this layer's BN apply +
    # relu into the consumer (a following ConvNormRelu fuses it on ingest;
    # XLA matmul consumers fuse the materialize for free)
    emit_pending: bool = False
    bn_sync_axis: Any = None
    # width_axis: name of a bound mesh axis the range-image width is sharded
    # over (shard_map width sharding) — 3x3 convs then exchange 1-column
    # halos with the neighboring shards (width_halo_exchange) instead of
    # relying on GSPMD's automatic halo insertion; bhcw layout only
    width_axis: Any = None

    @nn.compact
    def __call__(self, x: MaybePending):
        if self.layout in PLANAR_LAYOUTS:
            assert self.strides[0] == 1 and self.strides[1] in (1, 2)
            ch_ax = channel_axis_of(self.layout)
            wax = self.width_axis if not self.is_initializing() else None
            if wax is not None:
                assert self.layout == "bhcw", "width sharding is bhcw-only"
            fused_in = isinstance(x, PendingBN) and self.layout == "bhcw"
            if isinstance(x, PendingBN) and not fused_in:
                x = x.materialize()
            Ci = (x.y if fused_in else x).shape[ch_ax]
            sums = None
            if self.kernel == (1, 1):
                if fused_in:
                    x = x.materialize()
                k = self.param(
                    "kernel", self.kernel_init, (Ci, self.features), jnp.float32
                )
                c1 = conv1x1_planar if self.layout == "planar" else conv1x1_bhcw
                x = c1(x.astype(self.dtype), k.astype(self.dtype),
                       self.strides[1])
            else:
                assert self.kernel == (3, 3)
                k = self.param(
                    "kernel", self.kernel_init, (3, 3, Ci, self.features),
                    jnp.float32,
                )
                if self.layout == "planar":
                    x = conv3x3_planar_core(
                        x.astype(self.dtype), k.astype(self.dtype),
                        self.strides[1]
                    )
                elif wax is not None:
                    if not fused_in:
                        x = x.astype(self.dtype)
                    x = conv3x3_bhcw_width_sharded(
                        x, k.astype(self.dtype), self.strides[1],
                        self.use_pallas, wax,
                    )
                else:
                    if not fused_in:
                        x = x.astype(self.dtype)
                    x, sums = conv3x3_bhcw_consume(
                        x, k.astype(self.dtype), self.strides[1],
                        self.use_pallas,
                        want_stats=not self.use_running_average
                        and not self.is_initializing(),
                    )
            out = BatchNorm(
                self.use_running_average, self.dtype, channel_axis=ch_ax,
                affine_out=self.emit_pending and self.layout == "bhcw",
                sync_axis=self.bn_sync_axis,
                name="bn",
            )(x, sums)
            if isinstance(out, PendingBN):
                return out
            return nn.relu(out)

        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        x = BatchNorm(
            self.use_running_average, self.dtype,
            sync_axis=self.bn_sync_axis, name="bn",
        )(x)
        return nn.relu(x)


class DeconvNormRelu(nn.Module):
    """Transposed conv + BN + relu — the FPN aggregation upsampler.

    The reference deconvs use kernel (3,8)/stride (1,4)/pad (1,2) and
    (3,4)/(1,2)/(1,1) (rangedet/symbol/backbone/dla_backbone.py:144-151), both
    of which are exactly XLA 'SAME' transposed-conv padding (out_w = in_w * s).
    """

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    dtype: Dtype = jnp.bfloat16
    use_running_average: bool = False
    layout: str = "nhwc"
    bn_sync_axis: Any = None
    width_axis: Any = None  # see ConvNormRelu.width_axis

    @nn.compact
    def __call__(self, x):
        if self.layout in PLANAR_LAYOUTS:
            assert self.strides[0] == 1
            ch_ax = channel_axis_of(self.layout)
            k = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                self.kernel + (x.shape[ch_ax], self.features),
                jnp.float32,
            )
            if self.layout == "planar":
                dc = deconv_planar
            else:
                dc = lambda x, k, s: deconv_bhcw_best(x, k, s)
            wax = self.width_axis if not self.is_initializing() else None
            if wax is not None:
                # width shard: exchange a J+2-column halo (the phase
                # decomposition's own zero-pad margin, deconv_bhcw), run the
                # unmodified deconv on the extended slice, slice s·(J+2)
                # output columns — interior outputs are exact
                assert self.layout == "bhcw", "width sharding is bhcw-only"
                s = self.strides[1]
                halo = self.kernel[1] // s + 2
                x = width_halo_exchange(x.astype(self.dtype), wax, halo)
                x = dc(x, k.astype(self.dtype), s)
                x = x[..., s * halo : -s * halo]
            else:
                x = dc(x.astype(self.dtype), k.astype(self.dtype),
                       self.strides[1])
            x = BatchNorm(
                self.use_running_average, self.dtype, channel_axis=ch_ax,
                sync_axis=self.bn_sync_axis, name="bn",
            )(x)
            return nn.relu(x)
        x = nn.ConvTranspose(
            self.features,
            self.kernel,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="deconv",
        )(x)
        x = BatchNorm(
            self.use_running_average, self.dtype,
            sync_axis=self.bn_sync_axis, name="bn",
        )(x)
        return nn.relu(x)


def extract_patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 3x3 neighborhood gather: (B, H, W, C) -> (B, H, W, 9, C).

    Equivalent of mx.symbol.im2col(kernel=3, pad=1) in NHWC
    (rangedet/symbol/backbone/meta_kernel.py:16-38); border neighbors are 0,
    matching the reference's zero padding. Implemented as 9 static slices —
    free for XLA to fuse.
    """
    B, H, W, C = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        pad[:, dy : dy + H, dx : dx + W, :]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(taps, axis=3)
