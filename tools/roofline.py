"""Measured chip-capability ladder: what this TPU actually sustains at
the shapes the CoMat step is made of.

Prints ONE JSON line mapping probe -> {tf_per_s, ...}. Read together
with bench.py's per-phase `tf_per_s` breakdown, it turns "phase X runs
at N TF/s" into "phase X runs at N TF/s of a measured M TF/s
capability at its shapes" — the roofline evidence for the structural-
floor argument (nominal peak is meaningless for 320-1280-wide GEMMs:
measured round 1, square matmuls peak ~145 TF/s on a v5e whose nominal
bf16 peak is 197, and SD1.5-width GEMMs run 35-65 TF/s).

Probes:
  square_<n>           n x n x n bf16 matmul (chip practical peak)
  gemm_w<k>            (M=16384, K=k, N=k) bf16 — SD1.5/SDXL channel
                       widths 320/640/1280 (conv taps lower to K=C
                       GEMMs of exactly these widths)
  gemm_thin_d40        (M=4096, K=40, N=4096) — the attention QK^T
                       depth; bounds any d=40 attention design
  flash_att_res64      the Pallas flash kernel at the SD1.5 res-64
                       self-attention workload shape (B*heads=32,
                       q=kv=4096, d=40), fwd only
  conv3x3_vae_512      Pallas 3x3 conv at the VAE-decoder 512^2 x 128
                       shape vs XLA's conv

Usage: python tools/roofline.py   (real chip; serialize vs bench.py)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _timeit_chained(fn, *args, iters=20):
    """Steady-state seconds with a relay-safe device_get sync; the
    output feeds back as the first arg where shapes allow, else we
    rely on sequential dispatch of independent calls."""
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def _gemm_tf(M, K, N, iters=20):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (M, K), jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(k, 1), (K, N), jnp.bfloat16)
    dt = _timeit_chained(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16),
        a, b, iters=iters,
    )
    return 2.0 * M * K * N / dt / 1e12, dt


def main():
    tiny = "--tiny" in sys.argv  # CPU smoke mode: shapes /8, iters low
    div = 8 if tiny else 1
    out = {}

    for n in (1024, 2048, 4096):
        tf, dt = _gemm_tf(n // div, n // div, n // div, iters=3 if tiny else 20)
        out[f"square_{n // div}"] = {"tf_per_s": round(tf, 1), "s": dt}

    for k in (320, 640, 1280):
        tf, dt = _gemm_tf(16384 // div, k // div, k // div,
                          iters=3 if tiny else 20)
        out[f"gemm_w{k // div}"] = {"tf_per_s": round(tf, 1), "s": dt}

    tf, dt = _gemm_tf(4096 // div, 40, 4096 // div, iters=3 if tiny else 20)
    out["gemm_thin_d40"] = {"tf_per_s": round(tf, 1), "s": dt}

    # flash kernel at the res-64 self-attention workload shape
    try:
        from comat_tpu.ops.flash_attention import flash_attention

        B, Hh, S, D = 4, 8, 4096 // div, 40
        k = jax.random.PRNGKey(2)
        q = jax.random.normal(k, (B, Hh, S, D), jnp.bfloat16)
        kk = jax.random.normal(jax.random.fold_in(k, 1), (B, Hh, S, D),
                               jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(k, 2), (B, Hh, S, D),
                              jnp.bfloat16)
        dt = _timeit_chained(
            lambda q, kk, v: flash_attention(q, kk, v, interpret=tiny),
            q, kk, v, iters=2 if tiny else 10,
        )
        flops = 4.0 * B * Hh * S * S * D  # QK^T + PV
        out["flash_att_res64"] = {
            "tf_per_s": round(flops / dt / 1e12, 1), "s": dt,
            # d=40 MXU structural bound at this chip's measured square
            # peak: 40/128 lanes of depth/width per pass on QK/PV
            "note": "compare ~61 TF/s d=40 structural bound",
        }
    except Exception as e:  # pragma: no cover - probe is best-effort
        out["flash_att_res64"] = {"error": repr(e)}

    try:
        from comat_tpu.ops.conv3x3 import conv3x3_same, xla_conv3x3

        B, H, C = 4, 512 // div, 128
        k = jax.random.PRNGKey(3)
        x = jax.random.normal(k, (B, H, H, C), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C),
                              jnp.bfloat16)
        flops = 2.0 * B * H * H * 9 * C * C
        it = 2 if tiny else 10
        dtp = _timeit_chained(conv3x3_same, x, w, iters=it)
        dtx = _timeit_chained(
            lambda x, w: xla_conv3x3(x, w).astype(x.dtype), x, w, iters=it
        )
        out["conv3x3_vae_512"] = {
            "pallas_tf_per_s": round(flops / dtp / 1e12, 1),
            "xla_tf_per_s": round(flops / dtx / 1e12, 1),
        }
    except Exception as e:  # pragma: no cover
        out["conv3x3_vae_512"] = {"error": repr(e)}

    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
