"""Fused Meta-Kernel BLOCK (ops/meta_block_pallas.py): the two-pass
recompute kernel (taps -> meta_bn stats / fold+relu+1x1 agg) must match the
unfused MetaBlock (einsum MetaKernel + BatchNorm + conv1x1_bhcw) — forward,
eval, gradients, and running-stat updates — since both implement
dla_backbone.py:59-103's meta_kernel_conv with interchangeable checkpoints.

In f32 the fused path is bit-faithful to the same math (the kernel rounds
the tap product to the compute dtype, so f32 runs have no rounding step);
in bf16 it matches to bf16-rounding tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rangedet_tpu.models.dla_backbone import MetaBlock


def _setup(rng, dtype, B=2, H=8, W=40, C=16, Cm=8, Co=24):
    feat = jnp.asarray(rng.standard_normal((B, H, C, W)).astype(np.float32))
    feat = feat.astype(dtype)
    coords = jnp.asarray(
        rng.standard_normal((B, H, W, 3)).astype(np.float32)
    )
    kw = dict(
        channel_list=(Cm, C), features=Co, layout="bhcw", dtype=dtype
    )
    ref = MetaBlock(use_pallas=False, **kw)
    # pallas_eval=True: the shipped gate runs the fused block only in
    # training (recompute loses at eval), but the eval kernel path must
    # still be covered
    fus = MetaBlock(use_pallas=True, pallas_eval=True, **kw)
    params = jax.jit(ref.init, static_argnums=3)(
        jax.random.PRNGKey(0), feat, coords, True
    )
    return ref, fus, params, feat, coords


def _max_rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)


def test_fused_block_f32_exact(rng):
    """f32: fwd + batch_stats + eval + every gradient within 1e-4 rel."""
    ref, fus, params, feat, coords = _setup(
        np.random.default_rng(0), jnp.float32
    )

    train_apply = lambda mod: jax.jit(
        lambda p, x, c: mod.apply(p, x, c, True, mutable=["batch_stats"])
    )
    yr, vr = train_apply(ref)(params, feat, coords)
    yf, vf = train_apply(fus)(params, feat, coords)
    assert _max_rel(yr, yf) < 1e-4
    for k in ("mean", "var"):
        assert _max_rel(
            vr["batch_stats"]["meta_bn"][k], vf["batch_stats"]["meta_bn"][k]
        ) < 1e-4

    eval_apply = lambda mod: jax.jit(
        lambda p, x, c: mod.apply(p, x, c, False)
    )
    ye = eval_apply(ref)(params, feat, coords)
    yfe = eval_apply(fus)(params, feat, coords)
    assert _max_rel(ye, yfe) < 1e-4

    def loss(mod):
        def f(p, x):
            y, _ = mod.apply(p, x, coords, True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return f

    gr_p, gr_x = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(params, feat)
    gf_p, gf_x = jax.jit(jax.grad(loss(fus), argnums=(0, 1)))(params, feat)
    assert _max_rel(gr_x, gf_x) < 1e-4
    flat_r = jax.tree_util.tree_flatten_with_path(gr_p)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gf_p)[0])
    for path, a in flat_r:
        assert _max_rel(a, flat_f[path]) < 1e-4, jax.tree_util.keystr(path)


def test_fused_block_bf16_close(rng):
    """bf16 (the shipped dtype): bf16-rounding-level agreement."""
    ref, fus, params, feat, coords = _setup(
        np.random.default_rng(1), jnp.bfloat16
    )
    yr, _ = ref.apply(params, feat, coords, True, mutable=["batch_stats"])
    yf, _ = fus.apply(params, feat, coords, True, mutable=["batch_stats"])
    assert _max_rel(yr, yf) < 5e-2

    def loss(mod):
        def f(p, x):
            y, _ = mod.apply(p, x, coords, True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) ** 2)

        return f

    _, gr_x = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(params, feat)
    _, gf_x = jax.jit(jax.grad(loss(fus), argnums=(0, 1)))(params, feat)
    assert _max_rel(gr_x, gf_x) < 1e-1


@pytest.mark.parametrize("H,W", [(6, 33), (5, 17)])
def test_fused_block_odd_shapes(H, W):
    """Row-group fallback (H % 4 != 0) and odd widths stay exact."""
    ref, fus, params, feat, coords = _setup(
        np.random.default_rng(2), jnp.float32, B=1, H=H, W=W
    )
    yr, _ = ref.apply(params, feat, coords, True, mutable=["batch_stats"])
    yf, _ = fus.apply(params, feat, coords, True, mutable=["batch_stats"])
    assert _max_rel(yr, yf) < 1e-4


def test_fused_block_shard_map_syncbn():
    """Under shard_map dp with sync-BN, per-shard fused blocks must equal the
    single-device full-batch result (BatchNormFold psums the kernel's stat
    sums exactly like BatchNorm's sums path, tests/test_shard_map_bn.py)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(3)
    B, H, C, W, Cm, Co = 4, 8, 16, 40, 8, 24
    feat = jnp.asarray(rng.standard_normal((B, H, C, W)).astype(np.float32))
    coords = jnp.asarray(
        rng.standard_normal((B, H, W, 3)).astype(np.float32)
    )
    kw = dict(
        channel_list=(Cm, C), features=Co, layout="bhcw", dtype=jnp.float32
    )
    ref = MetaBlock(use_pallas=False, **kw)
    params = jax.jit(ref.init, static_argnums=3)(
        jax.random.PRNGKey(0), feat, coords, True
    )
    want, vref = ref.apply(params, feat, coords, True, mutable=["batch_stats"])

    fus = MetaBlock(use_pallas=True, bn_sync_axis="dp", **kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))

    def step(p, x, c):
        return fus.apply(p, x, c, True, mutable=["batch_stats"])

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P("dp"), P()),
        check_rep=False,
    )
    got, vgot = jax.jit(sharded)(params, feat, coords)
    assert _max_rel(want, got) < 1e-4
    for k in ("mean", "var"):
        assert _max_rel(
            vref["batch_stats"]["meta_bn"][k],
            vgot["batch_stats"]["meta_bn"][k],
        ) < 1e-4
