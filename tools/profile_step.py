"""Component-level timing of the CoMat train step on the real chip.

Times, per component, steady-state wall clock + XLA cost-analysis FLOPs
so we can see achieved TF/s per phase and decide where optimization
effort pays:

  unet_fwd      one CFG (2B) UNet forward (the pass-1 scan body)
  pass1         the full 50-step inference scan
  forward       pipeline.forward (pass1 + replay + VAE decode)
  blip          BLIP reward forward
  step          the full train step (fwd + bwd + AdamW)

Usage:  python tools/profile_step.py [batch] [--attrcon]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3, warmup=1):
    """Through the axon relay, block_until_ready under-reports small
    ops (async dispatch): force a real device->host readback of one
    element to close each timing window."""
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def timeit_chained(fn, params, x, extra, iters=10):
    """Per-iteration device time for fn(params, x, *extra) -> y with
    y.shape == x.shape: chain y back into x so iterations serialize on
    the device, and read back once. Removes relay dispatch pipelining
    from the measurement."""
    y = fn(params, x, *extra)
    jax.device_get(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(params, x, *extra)
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    sys.path.insert(0, ".")
    import bench

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pipe, blip, step, state, frozen, blip_params, batch_d, tcfg = (
        bench.build(batch)[:8]
    )
    from comat_tpu.losses.caption_reward import blip_caption_reward
    from comat_tpu.training.train_step import merge_params

    rng = jax.random.PRNGKey(7)
    params = merge_params(state.trainable, frozen)
    B = batch

    # --- one CFG UNet forward ---
    lat = jnp.zeros((2 * B, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((2 * B, 77, 768), jnp.bfloat16)
    t = jnp.zeros((2 * B,), jnp.int32)
    unet_fwd = jax.jit(
        lambda p, l, tt, c: pipe.unet_apply(p, l, tt, c, fast=True)[0]
        .astype(l.dtype)  # chainable: output dtype == input dtype
    )
    c = unet_fwd.lower(params, lat, t, ctx).compile()
    f_unet = float(c.cost_analysis()["flops"])
    # output eps has the latents' shape: chain it back as the input
    dt_unet = timeit_chained(c, params, lat, (t, ctx), iters=20)
    print(f"unet_fwd   {dt_unet*1e3:8.1f} ms   {f_unet/dt_unet/1e12:6.1f} TF/s")

    # --- fused (pass-1) UNet forward: LoRA folded into base kernels ---
    params_fused = pipe.fused_params(params)
    unet_fwd_fused = jax.jit(
        lambda p, l, tt, c: pipe.unet_apply(p, l, tt, c, fast=True,
                                            fused=True)[0].astype(l.dtype)
    )
    cf = unet_fwd_fused.lower(params_fused, lat, t, ctx).compile()
    f_unetf = float(cf.cost_analysis()["flops"])
    dt_unetf = timeit_chained(cf, params_fused, lat, (t, ctx), iters=20)
    print(f"unet_fused {dt_unetf*1e3:8.1f} ms   {f_unetf/dt_unetf/1e12:6.1f} TF/s")

    # --- full pipeline.forward ---
    def fwd(p, r, ids, nids, tr_idx):
        img, res = pipe.forward(
            p, r, ids, nids, tr_idx,
            num_inference_steps=tcfg.total_step, K=tcfg.K,
            guidance_scale=tcfg.guidance_scale,
            eos_positions=batch_d["eos_positions"],
        )
        return img, res.latents

    tr_idx = jnp.arange(0, 50, 10)
    cfwd = jax.jit(fwd).lower(
        params, rng, batch_d["input_ids"], batch_d["null_ids"], tr_idx
    ).compile()
    f_fwd = float(cfwd.cost_analysis()["flops"])
    dt_fwd = timeit(
        cfwd, params, rng, batch_d["input_ids"], batch_d["null_ids"],
        tr_idx,
    )
    print(f"forward    {dt_fwd*1e3:8.1f} ms   {f_fwd/dt_fwd/1e12:6.1f} TF/s")

    # --- BLIP reward ---
    img = jnp.zeros((B, 512, 512, 3))
    cblip = jax.jit(
        lambda bp, im: blip_caption_reward(
            blip, bp, im, batch_d["caption_ids"], batch_d["caption_mask"],
            batch_d["caption_labels"],
        )
    ).lower(blip_params, img).compile()
    f_blip = float(cblip.cost_analysis()["flops"])
    dt_blip = timeit(cblip, blip_params, img, iters=10)
    print(f"blip_fwd   {dt_blip*1e3:8.1f} ms   {f_blip/dt_blip/1e12:6.1f} TF/s")

    # --- VAE decode ---
    z = jnp.zeros((B, 64, 64, 4))
    cvae = jax.jit(lambda p, zz: pipe.decode_image(p, zz)).lower(
        params, z
    ).compile()
    f_vae = float(cvae.cost_analysis()["flops"])
    dt_vae = timeit(cvae, params, z, iters=10)
    print(f"vae_dec    {dt_vae*1e3:8.1f} ms   {f_vae/dt_vae/1e12:6.1f} TF/s")

    # --- full train step ---
    cstep = step.lower(state, frozen, blip_params, batch_d, rng).compile()
    f_step = float(cstep.cost_analysis()["flops"])
    state2, _, m = cstep(state, frozen, blip_params, batch_d, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        state2, _, m = cstep(state2, frozen, blip_params, batch_d, rng)
    jax.block_until_ready(m)
    dt_step = (time.perf_counter() - t0) / iters
    print(f"step       {dt_step*1e3:8.1f} ms   {f_step/dt_step/1e12:6.1f} TF/s")
    print(f"imgs/s/chip: {B/dt_step:.3f}")
    print(
        "derived: pass1={:.0f}ms replay+vae+blip+bwd={:.0f}ms".format(
            50 * dt_unetf * 1e3, (dt_step - 50 * dt_unetf) * 1e3
        )
    )


if __name__ == "__main__":
    main()
