#!/usr/bin/env python
"""Isolated Pallas-kernel and layer micro-benchmarks on real hardware:
fwd / dgrad / wgrad / fused-chain timings at the model's real shapes.

Every benchmark CHAINS its output back into the next iteration's input (a
real data dependency), so the device executes N iterations back-to-back and
the tunnel round-trip is paid once — un-chained per-call dispatch measures
only the ~30-130 ms tunnel RTT (verified the hard way).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    N = args.iters

    def timeit(name, step, x0):
        """step: x -> x' (same shape/dtype); chained N times INSIDE one jit.

        N separate jit calls do not pipeline on the tunneled axon backend —
        each pays a ~30-130 ms round trip even when chained through device
        buffers (measured: a 2.4 ms conv read as 113 ms). A fori_loop inside
        a single jit runs the chain on device; one dispatch, one fetch.
        """
        # the sync fetch must be a SCALAR: np.asarray(x) pulls the whole
        # array over the ~12 MB/s tunnel (a 43 MB activation reads as
        # 3.6 s — this bit the first r5 kernel profile, whose "timings"
        # were pure transfer), so the chain reduces to one element on
        # device and only that crosses the wire
        f = jax.jit(
            lambda x: jax.lax.fori_loop(
                0, N, lambda _, a: step(a), x
            ).ravel()[:1]
        )
        x = f(x0)  # compile
        float(np.asarray(x)[0])
        t0 = time.perf_counter()
        x = f(x0)
        float(np.asarray(x)[0])
        dt = (time.perf_counter() - t0) / N * 1000
        print(json.dumps({"part": name, "ms": round(dt, 3)}), flush=True)

    from rangedet_tpu.ops.conv_pallas import (
        _conv3x3_fwd,
        _conv3x3_wgrad,
        conv3x3_bhcw,
        conv3x3_bnrelu_stats_bhcw,
    )

    key = jax.random.PRNGKey(0)
    B, H, W = 2, 64, 2656
    for C in (64, 128):
        x0 = jax.random.normal(key, (B, H, C, W), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        gy = jax.random.normal(key, (B, H, C, W), jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)

        timeit(f"conv{C} fwd", lambda x: conv3x3_bhcw(x, w), x0)
        wf = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
        timeit(f"conv{C} dgrad(fwd-kernel)",
               lambda g: _conv3x3_fwd(g, wf), gy)
        timeit(
            f"conv{C} wgrad",
            lambda x: x + (_conv3x3_wgrad(x, gy).sum() * 1e-30).astype(x.dtype),
            x0,
        )

        def vjp_step(x):
            dx, dw = jax.vjp(conv3x3_bhcw, x, w)[1](gy)
            return dx + (dw.sum() * 1e-30).astype(x.dtype)

        timeit(f"conv{C} full vjp", vjp_step, x0)
        timeit(f"conv{C} bnrelu_stats fwd",
               lambda x: conv3x3_bnrelu_stats_bhcw(x, w, scale, bias)[0], x0)

        def chain_vjp(x):
            f = lambda a: conv3x3_bnrelu_stats_bhcw(a, w, scale, bias)[0]
            return jax.vjp(f, x)[1](gy)[0]

        timeit(f"conv{C} bnrelu_stats vjp", chain_vjp, x0)

    # meta block shapes: res1_unit2 (C=64)
    from rangedet_tpu.models.meta_kernel import MetaKernel

    C = 64
    feat0 = jax.random.normal(key, (B, H, C, W), jnp.bfloat16)
    coords = jax.random.normal(key, (B, H, W, 3), jnp.bfloat16)
    mk = MetaKernel(channel_list=(32, 64), dtype=jnp.bfloat16, layout="bhcw")
    params = mk.init(jax.random.PRNGKey(1), feat0, coords)
    g9 = jnp.ones((B, H, 9 * C, W), jnp.bfloat16)
    timeit("meta_kernel fwd",
           lambda f: mk.apply(params, f, coords)[:, :, :C, :], feat0)
    timeit("meta_kernel vjp",
           lambda f: jax.vjp(lambda a: mk.apply(params, a, coords), f)[1](g9)[0],
           feat0)

    from rangedet_tpu.models.layers import conv3x3_bhcw_best, deconv_bhcw

    k8 = jax.random.normal(key, (3, 8, 128, 128), jnp.bfloat16) * 0.05
    x4 = jax.random.normal(key, (B, H, 128, W // 4), jnp.bfloat16)
    timeit("deconv(3,8)s4 fwd",
           lambda x: deconv_bhcw(x, k8, 4)[..., : W // 4], x4)
    gup = jnp.ones((B, H, 128, W), jnp.bfloat16)
    timeit("deconv(3,8)s4 vjp",
           lambda x: jax.vjp(lambda v: deconv_bhcw(v, k8, 4), x)[1](gup)[0],
           x4)

    ks = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    xs0 = jax.random.normal(key, (B, H, 64, W), jnp.bfloat16)
    timeit("conv64 stride2 fwd",
           lambda x: jnp.concatenate(
               [conv3x3_bhcw_best(x, ks, 2)] * 2, axis=-1), xs0)
    g2 = jnp.ones((B, H, 64, W // 2), jnp.bfloat16)
    timeit("conv64 stride2 vjp",
           lambda x: jax.vjp(lambda v: conv3x3_bhcw_best(v, ks, 2), x)[1](g2)[0],
           xs0)


if __name__ == "__main__":
    main()
