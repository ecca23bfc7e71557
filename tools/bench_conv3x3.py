"""Correctness + throughput check of the Pallas conv3x3 kernel vs
XLA's native conv, on the real chip. Usage: python tools/bench_conv3x3.py
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from comat_tpu.ops.conv3x3 import conv3x3_same, xla_conv3x3  # noqa: E402


def xla_conv(x, w):
    return xla_conv3x3(x, w).astype(x.dtype)


def check_correct(B, H, C, Cout):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, H, C), jnp.float32)
    w = jax.random.normal(
        jax.random.fold_in(k, 1), (3, 3, C, Cout), jnp.float32
    ) * (9 * C) ** -0.5
    got = jax.jit(conv3x3_same)(x, w)
    want = jax.jit(xla_conv)(x, w)
    err = float(jnp.max(jnp.abs(got - want)))
    # grads
    def loss_p(x, w):
        return (conv3x3_same(x, w).astype(jnp.float32) ** 2).mean()
    def loss_x(x, w):
        return (xla_conv(x, w).astype(jnp.float32) ** 2).mean()
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, w)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(x, w)
    gerr = max(
        float(jnp.max(jnp.abs(gp[0] - gx[0]))),
        float(jnp.max(jnp.abs(gp[1] - gx[1]))),
    )
    print(f"correct B{B} H{H} C{C}->{Cout}: fwd_err={err:.2e} grad_err={gerr:.2e}")
    assert err < 1e-3 and gerr < 1e-3, (err, gerr)


def bench(B, H, C, Cout, R=8, iters=4):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, H, C), jnp.bfloat16)
    w = jax.random.normal(
        jax.random.fold_in(k, 1), (3, 3, C, C), jnp.bfloat16
    ) * (9 * C) ** -0.5

    for name, f in [("pallas", conv3x3_same), ("xla", xla_conv)]:
        @jax.jit
        def chain(x, w, f=f):
            return jax.lax.fori_loop(0, R, lambda i, y: f(y, w), x)

        out = chain(x, w)
        jax.device_get(np.asarray(out[0, 0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = chain(x, w)
        jax.device_get(np.asarray(out[0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters / R
        fl = 2 * B * H * H * C * C * 9
        print(f"{name:6s} B{B} {H}x{H}x{C}: {dt*1e3:7.3f} ms  "
              f"{fl/dt/1e12:6.0f} TF/s")


if __name__ == "__main__":
    check_correct(2, 16, 128, 128)
    check_correct(1, 32, 320, 320)
    check_correct(2, 24, 256, 128)
    bench(8, 64, 320, 320)
    bench(8, 32, 640, 640)
    bench(4, 512, 128, 128)
    bench(4, 128, 512, 512)
