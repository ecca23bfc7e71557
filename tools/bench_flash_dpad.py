"""Flash-attention head-dim padding sweep (VERDICT r2 #8).

The kernel's header records 49.6 TF/s at the SD1.5 hot shape
(B8 H8 S4096 d40) against a claimed ~61 TF/s d-padded ceiling. This
sweeps COMAT_FLASH_D_PAD in {0, 64, 128} at that shape, fwd and
fwd+bwd, and prints achieved TF/s on the UNPADDED (useful) FLOPs, so
the padded variant is charged for its zero work. Run on TPU:

    python tools/bench_flash_dpad.py

Each setting runs in a fresh subprocess: the pad knob is read at trace
time and jit caches would otherwise alias across settings.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SHAPES = [(8, 8, 4096, 40)]  # SD1.5 spatial self-attention at 512px

_CHILD = r"""
import os, sys, time, json
import jax, jax.numpy as jnp

B, H, S, d = map(int, sys.argv[1:5])
from comat_tpu.ops.flash_attention import flash_attention, flash_attention_diff

k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(k1, (B, H, S, d), jnp.bfloat16)
k = jax.random.normal(k2, (B, H, S, d), jnp.bfloat16)
v = jax.random.normal(k3, (B, H, S, d), jnp.bfloat16)
flops_fwd = 4.0 * B * H * S * S * d           # QK^T + PV
flops_bwd = 2.5 * flops_fwd                   # recompute + 4 grad matmuls


def timeit(fn, args, iters=30):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


t_fwd = timeit(flash_attention, (q, k, v))


def fwd_bwd(q, k, v):
    out, vjp = jax.vjp(flash_attention_diff, q, k, v)
    return vjp(out)


t_fb = timeit(fwd_bwd, (q, k, v))
print(json.dumps({
    "d_pad": os.environ.get("COMAT_FLASH_D_PAD", "0"),
    "fwd_s": round(t_fwd, 5),
    "fwd_tf_per_s": round(flops_fwd / t_fwd / 1e12, 1),
    "fwd_bwd_s": round(t_fb, 5),
    "fwd_bwd_tf_per_s": round((flops_fwd + flops_bwd) / t_fb / 1e12, 1),
}))
"""


def main():
    for B, H, S, d in SHAPES:
        print(f"# shape B{B} H{H} S{S} d{d}")
        for pad in (0, 64, 128):
            env = dict(os.environ, COMAT_FLASH_D_PAD=str(pad))
            r = subprocess.run(
                [sys.executable, "-c", _CHILD, str(B), str(H), str(S),
                 str(d)],
                env=env, capture_output=True, text=True, timeout=1200,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout else ""
            try:
                print(json.dumps(json.loads(line)))
            except Exception:
                print(json.dumps({"d_pad": pad, "error": r.stderr[-400:]}))


if __name__ == "__main__":
    main()
