"""Meta-Kernel: fused Pallas kernel vs the XLA oracle, forward and backward
(the custom VJP routes gradients through the numerically-equivalent XLA
formulation, so fwd+bwd must match jax.grad of the oracle module)."""
import numpy as np
import jax
import jax.numpy as jnp

from rangedet_tpu.models.meta_kernel import MetaKernel


def _setup(rng, B=1, H=8, W=40, C=16, C_mid=8):
    feat = jnp.asarray(
        rng.standard_normal((B, H, W, C)).astype(np.float32)
    ).astype(jnp.bfloat16)  # both paths compute in the module dtype
    coords = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    mk = MetaKernel(channel_list=(C_mid, C), use_pallas=False)
    params = jax.jit(mk.init)(jax.random.PRNGKey(0), feat, coords)
    return mk, params, feat, coords


def _fused(params, feat, coords, interpret=True):
    from rangedet_tpu.ops.meta_kernel_pallas import meta_kernel_fused

    p0 = params["params"]["mlp0"]
    p1 = params["params"]["mlp1"]
    d = feat.dtype
    return meta_kernel_fused(
        feat, coords,
        p0["kernel"].astype(d), p0["bias"].astype(d),
        p1["kernel"].astype(d), p1["bias"].astype(d),
        32, interpret,
    )


def test_fused_forward_matches_oracle(rng):
    mk, params, feat, coords = _setup(rng)
    want = np.asarray(jax.jit(mk.apply)(params, feat, coords))
    got = np.asarray(jax.jit(
        lambda p, f, c: _fused(p, f, c))(params, feat, coords))
    np.testing.assert_allclose(got, want, atol=4e-2, rtol=4e-2)  # bf16


def test_fused_vjp_matches_oracle_grad(rng):
    mk, params, feat, coords = _setup(rng)

    def loss_fused(p, f):
        return jnp.sum(_fused(p, f, coords).astype(jnp.float32) ** 2)

    def loss_oracle(p, f):
        return jnp.sum(mk.apply(p, f, coords).astype(jnp.float32) ** 2)

    gp_f, gf_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, feat)
    gp_o, gf_o = jax.jit(jax.grad(loss_oracle, argnums=(0, 1)))(params, feat)

    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_o),
                               atol=2e-1, rtol=5e-2)
    for name in ("mlp0", "mlp1"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(gp_f["params"][name][leaf]),
                np.asarray(gp_o["params"][name][leaf]),
                atol=2e-1, rtol=5e-2,
            )


def test_meta_module_trains_with_pallas(rng):
    """MetaKernel(use_pallas=True) is trainable end-to-end: one grad step
    through the module's fused path changes the MLP params."""
    mk, params, feat, coords = _setup(rng)
    mkp = MetaKernel(channel_list=(8, 16), use_pallas=True)

    def loss(p):
        return jnp.sum(mkp.apply(p, feat, coords).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    gnorm = float(jnp.sqrt(sum(
        jnp.sum(x.astype(jnp.float32) ** 2)
        for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0
