"""Microbenchmark: does int8 matmul beat bf16 on this chip via XLA?

Gates the int8 pass-1 lever (opt-in quantized no-grad UNet forwards):
measures bf16xbf16->f32 vs int8xint8->int32 dot_general at the SD1.5
channel widths, plus the quantize-activation overhead pattern we'd pay
(dynamic per-row absmax) — if speedup < ~1.4x end-to-end the lever is
not worth the numerics risk.

Usage: python tools/bench_int8.py  (real chip; serialize vs bench.py)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained_scalar(fn, a, b, iters=30):
    """fn(a, b) -> scalar-castable output; serialize via dependency."""
    out = fn(a, b)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_shape(M, K, N):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K), np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N), np.int8))
    abf = jnp.asarray(rng.standard_normal((M, K), np.float32), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((K, N), np.float32), jnp.bfloat16)

    flops = 2.0 * M * K * N

    f_bf = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).sum()
    )
    f_i8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).sum()
    )

    # realistic int8 path: bf16 activations quantized per-row on the fly,
    # int8 weight, fp32 rescale (weights pre-quantized offline)
    def f_dyn(a_bf, b_i8):
        s = jnp.max(jnp.abs(a_bf.astype(jnp.float32)), axis=1,
                    keepdims=True) / 127.0
        a_q = jnp.clip(
            jnp.round(a_bf.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a_q, b_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * s).sum()

    f_dynj = jax.jit(f_dyn)

    t_bf = timeit_chained_scalar(f_bf, abf, bbf)
    t_i8 = timeit_chained_scalar(f_i8, a8, b8)
    t_dyn = timeit_chained_scalar(f_dynj, abf, b8)
    print(
        f"M={M:5d} K={K:4d} N={N:5d}  "
        f"bf16 {flops/t_bf/1e12:6.1f} TF/s ({t_bf*1e6:8.1f} us)  "
        f"int8 {flops/t_i8/1e12:6.1f} TF/s ({t_i8*1e6:8.1f} us)  "
        f"int8+dynq {flops/t_dyn/1e12:6.1f} TF/s ({t_dyn*1e6:8.1f} us)  "
        f"speedup(dynq) {t_bf/t_dyn:4.2f}x"
    )


def main():
    print("device:", jax.devices()[0])
    # SD1.5 shapes: attention/FF matmuls at res 64/32/16/8, bs 8 (CFG)
    for M, K, N in [
        (8 * 4096, 320, 320),     # res64 attn proj
        (8 * 4096, 320, 2560),    # res64 FF in
        (8 * 4096, 1280, 320),    # res64 FF out
        (8 * 1024, 640, 640),     # res32 attn proj
        (8 * 1024, 640, 5120),    # res32 FF in
        (8 * 256, 1280, 1280),    # res16 attn proj
        (8 * 256, 1280, 10240),   # res16 FF in
        (4096, 4096, 4096),       # square reference point
    ]:
        bench_shape(M, K, N)


if __name__ == "__main__":
    main()
