"""Pallas (B,H,C,W) conv3x3 kernels (ops/conv_pallas.py) and the "bhcw"
model layout: kernel fwd/dgrad/wgrad vs the XLA conv oracle, and full-model
bhcw <-> nhwc equivalence (the bhcw XLA fallback path used off-TPU)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rangedet_tpu.data.synthetic import make_batch
from rangedet_tpu.models import RangeDet
from rangedet_tpu.models.convert import convert_params
from rangedet_tpu.models.layers import (
    conv1x1_bhcw,
    conv3x3_bhcw_xla,
    deconv_bhcw,
    deconv_planar,
)
from rangedet_tpu.ops.conv_pallas import conv3x3_bhcw
from tiny import tiny_config


def _oracle(x, w, stride_w=1):
    xh = jnp.transpose(x, (0, 1, 3, 2))
    y = lax.conv_general_dilated(
        xh, w, (1, stride_w), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.transpose(y, (0, 1, 3, 2))


def test_conv3x3_pallas_fwd_bwd_exact():
    rng = np.random.RandomState(0)
    B, H, Ci, W, Co = 2, 16, 16, 384, 24
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    gy = jnp.asarray(rng.randn(B, H, Co, W).astype(np.float32))

    y0 = _oracle(x, w)
    y1 = conv3x3_bhcw(x, w, None, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)

    f0 = lambda x, w: jnp.sum(_oracle(x, w) * gy)
    f1 = lambda x, w: jnp.sum(conv3x3_bhcw(x, w, None, True) * gy)
    dx0, dw0 = jax.grad(f0, (0, 1))(x, w)
    dx1, dw1 = jax.grad(f1, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dw1), np.asarray(dw0), rtol=1e-5, atol=1e-3
    )


def test_conv3x3_pallas_odd_width_and_rows():
    # W not a multiple of 128 (edge-column masking), explicit rows_per_step
    rng = np.random.RandomState(1)
    B, H, Ci, W, Co = 1, 8, 8, 165, 16
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    for r in (1, 2, 4):
        y = conv3x3_bhcw(x, w, r, True)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_oracle(x, w)), atol=1e-4
        )


def test_bhcw_xla_forms_match_oracle():
    rng = np.random.RandomState(2)
    B, H, Ci, W, Co = 2, 8, 8, 64, 12
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w3 = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    for s in (1, 2):
        np.testing.assert_allclose(
            np.asarray(conv3x3_bhcw_xla(x, w3, s)),
            np.asarray(_oracle(x, w3, s)), atol=1e-4,
        )
    w1 = jnp.asarray(0.1 * rng.randn(Ci, Co).astype(np.float32))
    y = conv1x1_bhcw(x, w1, 2)
    ref = jnp.einsum("bhiw,io->bhow", x[..., ::2], w1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_deconv_bhcw_matches_planar():
    rng = np.random.RandomState(3)
    B, H, Ci, W, Co = 1, 8, 6, 32, 10
    x = jnp.asarray(rng.randn(B, Ci, H, W).astype(np.float32))
    for (kh, kw), s in (((3, 8), 4), ((3, 4), 2)):
        k = jnp.asarray(0.1 * rng.randn(kh, kw, Ci, Co).astype(np.float32))
        ref = deconv_planar(x, k, s)  # (B, Co, H, W*s)
        got = deconv_bhcw(jnp.transpose(x, (0, 2, 1, 3)), k, s)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 2, 1, 3))), np.asarray(ref),
            atol=1e-4,
        )


@pytest.mark.heavy
def test_bhcw_model_matches_nhwc():
    cfg_b = tiny_config().replace(layout="bhcw")
    cfg_n = tiny_config().replace(layout="nhwc")
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(cfg_b, 1, seed=0, num_boxes=4).items()
    }
    mb = RangeDet(**cfg_b.model_kwargs())
    mn = RangeDet(**cfg_n.model_kwargs())
    vb = jax.jit(mb.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), batch["input_data"], batch["coord"], False
    )
    converted = convert_params(vb["params"], "nhwc")
    out_b = mb.apply(
        {"params": vb["params"], "batch_stats": vb["batch_stats"]},
        batch["input_data"], batch["coord"], False,
    )
    out_n = mn.apply(
        {"params": converted, "batch_stats": vb["batch_stats"]},
        batch["input_data"], batch["coord"], False,
    )
    for a, b in zip(out_b[0] + out_b[1], out_n[0] + out_n[1]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-3
        )


def test_conv3x3_bnrelu_fused_fwd_bwd_exact():
    # fused producer-BN ingest: conv(relu(x*s+b)) == materialized oracle,
    # incl. gradients to all four inputs (ops/conv_pallas.py
    # conv3x3_bnrelu_bhcw; the fold of mxnext conv-BN-relu chaining,
    # mxnext/simple.py:502)
    from rangedet_tpu.ops.conv_pallas import conv3x3_bnrelu_bhcw

    rng = np.random.RandomState(2)
    B, H, Ci, W, Co = 2, 16, 16, 200, 24
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    s = jnp.asarray(1.0 + 0.3 * rng.randn(Ci).astype(np.float32))
    b = jnp.asarray(0.2 * rng.randn(Ci).astype(np.float32))
    gy = jnp.asarray(rng.randn(B, H, Co, W).astype(np.float32))

    def oracle(x, w, s, b):
        a = jnp.maximum(x * s[None, None, :, None] + b[None, None, :, None], 0)
        return _oracle(a, w)

    y0 = oracle(x, w, s, b)
    y1 = conv3x3_bnrelu_bhcw(x, w, s, b, None, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)

    f0 = lambda *a: jnp.sum(oracle(*a) * gy)
    f1 = lambda *a: jnp.sum(conv3x3_bnrelu_bhcw(*a, None, True) * gy)
    g0 = jax.grad(f0, (0, 1, 2, 3))(x, w, s, b)
    g1 = jax.grad(f1, (0, 1, 2, 3))(x, w, s, b)
    for a0, a1 in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a0), rtol=1e-4, atol=2e-3
        )


def test_pending_bn_chain_matches_materialized():
    # A ConvNormRelu chain with emit_pending must equal the plain chain
    # (same params; CPU fallback materializes, so this checks the module
    # plumbing and the f32 affine fold).
    from rangedet_tpu.models.layers import ConvNormRelu, materialize

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 12, 64).astype(np.float32))

    import flax.linen as nn

    class Chain(nn.Module):
        pend: bool

        @nn.compact
        def __call__(self, h):
            for i in range(3):
                h = ConvNormRelu(
                    16, dtype=jnp.float32, use_running_average=False,
                    layout="bhcw", emit_pending=self.pend, name=f"c{i}",
                )(h)
            return materialize(h)

    v = Chain(pend=True).init(jax.random.PRNGKey(0), x)
    y_pend, _ = Chain(pend=True).apply(v, x, mutable=["batch_stats"])
    y_plain, _ = Chain(pend=False).apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_pend), np.asarray(y_plain), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_stats_variants_exact():
    # in-kernel BN sums (y, sum, sumsq) + their gradient flow (the stats
    # cotangent folds back into gy: conv_pallas._stats_adjust)
    from rangedet_tpu.ops.conv_pallas import (
        conv3x3_bnrelu_stats_bhcw,
        conv3x3_stats_bhcw,
    )

    rng = np.random.RandomState(4)
    B, H, Ci, W, Co = 2, 16, 16, 200, 24
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    s = jnp.asarray(1.0 + 0.3 * rng.randn(Ci).astype(np.float32))
    b = jnp.asarray(0.2 * rng.randn(Ci).astype(np.float32))

    def oracle_plain(x, w):
        y = _oracle(x, w)
        return y, jnp.sum(y, axis=(0, 1, 3)), jnp.sum(y * y, axis=(0, 1, 3))

    def oracle_fused(x, w, s, b):
        a = jnp.maximum(x * s[None, None, :, None] + b[None, None, :, None], 0)
        return oracle_plain(a, w)

    for got, want in (
        (conv3x3_stats_bhcw(x, w, None, True), oracle_plain(x, w)),
        (conv3x3_bnrelu_stats_bhcw(x, w, s, b, None, True),
         oracle_fused(x, w, s, b)),
    ):
        for g, o in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(o), rtol=1e-4, atol=1e-3
            )

    # gradients: a loss touching y AND the stats outputs
    def loss_o(x, w, s, b):
        y, s1, s2 = oracle_fused(x, w, s, b)
        return jnp.sum(y**2) * 1e-2 + jnp.sum(s1 * s2) * 1e-4

    def loss_k(x, w, s, b):
        y, s1, s2 = conv3x3_bnrelu_stats_bhcw(x, w, s, b, None, True)
        return jnp.sum(y**2) * 1e-2 + jnp.sum(s1 * s2) * 1e-4

    g0 = jax.grad(loss_o, (0, 1, 2, 3))(x, w, s, b)
    g1 = jax.grad(loss_k, (0, 1, 2, 3))(x, w, s, b)
    for a0, a1 in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a0), rtol=2e-3, atol=5e-3
        )


def test_pallas_conv_under_shard_map():
    # the multi-chip premise: pallas_call runs per-shard under manual
    # (shard_map) sharding — batch sharded over "data", every shard
    # convolving its local block (train_step.py:build_train_step_fn picks
    # shard_map on data-only meshes precisely because GSPMD cannot
    # partition the custom call)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from rangedet_tpu.parallel import make_mesh

    rng = np.random.RandomState(7)
    B, H, Ci, W, Co = 4, 8, 8, 128, 8
    x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
    mesh = make_mesh({"data": 4})

    def per_shard(x, w):
        return conv3x3_bhcw(x, w, None, True)  # interpret=True on CPU

    y = shard_map(
        per_shard, mesh=mesh, in_specs=(P("data"), P()),
        out_specs=P("data"), check_rep=False,
    )(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_oracle(x, w)),
                               atol=1e-4)


def test_stride2_phase_conv_matches_xla(rng):
    """Phase-packed stride-2 conv (conv3x3_stride2_phase) == the SAME
    strided conv (shifted-einsum oracle), via the real Pallas kernel in
    interpret mode."""
    from rangedet_tpu.models.layers import (
        conv3x3_bhcw_xla,
        conv3x3_stride2_phase,
    )

    B, H, C, Co, W = 2, 8, 8, 16, 64
    x = jnp.asarray(rng.standard_normal((B, H, C, W)), jnp.float32)
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, Co)), jnp.float32)
    want = conv3x3_bhcw_xla(x, k, 2)
    got = conv3x3_stride2_phase(x, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5
    )
    # gradients flow through the packing (custom-VJP conv + differentiable
    # packing): finite and matching the oracle's
    def loss_phase(x, k):
        return (conv3x3_stride2_phase(x, k, interpret=True) ** 2).sum()

    def loss_xla(x, k):
        return (conv3x3_bhcw_xla(x, k, 2) ** 2).sum()

    gx_p, gk_p = jax.grad(loss_phase, argnums=(0, 1))(x, k)
    gx_o, gk_o = jax.grad(loss_xla, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_o),
                               rtol=1e-4, atol=1e-4)


def test_deconv_phase_conv_matches_einsum(rng):
    """Phase-packed deconv (deconv_bhcw_phase_conv) == the phase-decomposed
    einsum deconv for both shipped shapes (3,8)/s4 and (3,4)/s2."""
    from rangedet_tpu.models.layers import deconv_bhcw, deconv_bhcw_phase_conv

    B, H, C, Co = 2, 8, 8, 8
    for kw, s, W in (((3, 8), 4, 32), ((3, 4), 2, 64)):
        x = jnp.asarray(rng.standard_normal((B, H, C, W)), jnp.float32)
        k = jnp.asarray(
            0.1 * rng.standard_normal(kw + (C, Co)), jnp.float32
        )
        want = deconv_bhcw(x, k, s)
        got = deconv_bhcw_phase_conv(x, k, s, interpret=True)
        np.testing.assert_allclose(
            np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5,
            err_msg=f"kw={kw} s={s}",
        )

        def loss_p(x, k):
            return (deconv_bhcw_phase_conv(x, k, s, interpret=True) ** 2).sum()

        def loss_o(x, k):
            return (deconv_bhcw(x, k, s) ** 2).sum()

        gx_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(x, k)
        gx_o, gk_o = jax.grad(loss_o, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_o),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_o),
                                   rtol=1e-4, atol=1e-4)


def test_conv3x3_pair_mode_exact():
    """Pair-row MXU packing (two output rows per matmul, _pair_gain) fires
    at the model's 64-channel shapes and at the 8->64 stem conv; results and
    all gradients must match the row-major oracle exactly."""
    from rangedet_tpu.ops.conv_pallas import (
        _pair_gain,
        conv3x3_bnrelu_stats_bhcw,
    )

    assert _pair_gain(64, 64) and _pair_gain(8, 64)
    assert not _pair_gain(128, 128) and not _pair_gain(72, 128)

    rng = np.random.RandomState(3)
    for Ci, Co in ((64, 64), (8, 64)):
        B, H, W = 2, 16, 256
        x = jnp.asarray(rng.randn(B, H, Ci, W).astype(np.float32))
        w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
        gy = jnp.asarray(rng.randn(B, H, Co, W).astype(np.float32))

        y0, y1 = _oracle(x, w), conv3x3_bhcw(x, w, None, True)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)

        f0 = lambda x, w: jnp.sum(_oracle(x, w) * gy)
        f1 = lambda x, w: jnp.sum(conv3x3_bhcw(x, w, None, True) * gy)
        dx0, dw0 = jax.grad(f0, (0, 1))(x, w)
        dx1, dw1 = jax.grad(f1, (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dw1), np.asarray(dw0), rtol=1e-5, atol=1e-3
        )

        # fused producer-affine + stats variant: grads through y, s1, s2
        s = jnp.asarray(1.0 + 0.3 * rng.randn(Ci).astype(np.float32))
        b = jnp.asarray(0.2 * rng.randn(Ci).astype(np.float32))
        cw = jnp.cos(jnp.arange(Co, dtype=jnp.float32))

        def fused(x, w, s, b):
            y, s1, s2 = conv3x3_bnrelu_stats_bhcw(x, w, s, b, None, True)
            return jnp.sum(y * gy) + jnp.sum(s1 * cw) + jnp.sum(s2 * cw)

        def ref(x, w, s, b):
            a = jnp.maximum(x * s[None, None, :, None]
                            + b[None, None, :, None], 0.0)
            y = _oracle(a, w)
            return (jnp.sum(y * gy) + jnp.sum(y.sum((0, 1, 3)) * cw)
                    + jnp.sum((y * y).sum((0, 1, 3)) * cw))

        g1 = jax.grad(fused, (0, 1, 2, 3))(x, w, s, b)
        g0 = jax.grad(ref, (0, 1, 2, 3))(x, w, s, b)
        for a, e in zip(g1, g0):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-3
            )
