"""The differentiable online-generation sampler — CoMat's hot loop,
re-architected for XLA.

Reference semantics being reproduced (TrainableSDPipeline.py:128-185
with the trainer's hardcoded flags bp_on_trained=True, early_exit=False,
double_laststep=False, fast_training=False, detach_gradient=True —
training_script.py:558-566):

- 50 DDPM steps; gradients flow through the UNet ONLY at the K trained
  steps (`torch.set_grad_enabled(i in training_timesteps)` :138), whose
  input latents are attached (:141-145);
- the scheduler chain carries gradients from the first trained step
  onward (:163), so the K trained UNet calls are *nested*: an early
  trained step's gradient flows through later trained steps' inputs;
- at non-trained steps the UNet output is a constant.

TPU-first two-pass design (instead of translating grad-mode toggles):

  PASS 1 (inference): one `lax.scan` over all S steps, everything
  stop-gradient, Pallas flash attention, no residuals. Saves the guided
  eps per step and the latent entering each step.

  PASS 2 (differentiable replay): `lax.scan` over the K trained
  segments. Each segment runs ONE differentiable UNet call at its
  trained step (cached-primal: free forward, VJP-on-demand), then
  replays the following `interval-1` scheduler steps with the saved
  (constant) eps — pure affine arithmetic, which is exact because the
  DDPM step is affine in (x, eps, noise) (tested in
  test_schedulers.py). The scan also emits each segment's entry latent;
  attention capture (attrcon) happens AFTER the scan, only at the A
  chosen segments, on their gathered entry latents — matching the
  reference, which captures only at the attrcon steps.

This matches the reference's gradient structure exactly while paying
K extra UNet forwards (~10% of the 50-step budget) instead of the ~2x
a naively remat'd single differentiable scan would cost, and while
keeping per-step DDPM noise identical across passes via fold_in(rng, i).

The K-step schedule (training_script.py:563-566) is uniform-stride with
a random start, so `trained_idx = start + interval*k` arrives as a
traced (K,) array — no recompilation across steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jax_dtypes

from comat_tpu.diffusion.schedulers import (
    SamplerCoeffs,
    ddpm_step_from_coeffs,
)


class SampleResult(NamedTuple):
    latents: jnp.ndarray          # (B, h, w, 4) final, differentiable
    captured: Dict[str, Any]      # key -> list of (A, B, heads, HW, 77)
                                  # bf16 (cond half; A = len(capture_idx))
    eps_table: jnp.ndarray        # (S, B, h, w, 4) guided eps (constant)
    latents_traj: jnp.ndarray     # (S, B, h, w, 4) pass-1 inputs (constant)


def _step_noise(rng: jnp.ndarray, i: jnp.ndarray, shape, dtype):
    return jax.random.normal(jax.random.fold_in(rng, i), shape, dtype)


def sample_inference(
    eps_model: Callable,
    coeffs: SamplerCoeffs,
    latents0: jnp.ndarray,
    rng: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pass 1 / plain inference sampling. Entirely gradient-free.

    Returns (final_latents, eps_table, latents_traj); the latter two
    feed the differentiable replay.
    """
    S = coeffs.timesteps.shape[0]

    def body(x, i):
        x = jax.lax.stop_gradient(x)
        eps, _ = eps_model(x, coeffs.timesteps[i], False)
        eps = jax.lax.stop_gradient(eps)
        noise = _step_noise(rng, i, x.shape, jnp.float32)
        x_next, _ = ddpm_step_from_coeffs(coeffs, i, x, eps, noise)
        return x_next, (x, eps)

    x_final, (traj, eps_table) = jax.lax.scan(
        body, latents0, jnp.arange(S)
    )
    return (
        jax.lax.stop_gradient(x_final),
        jax.lax.stop_gradient(eps_table),
        jax.lax.stop_gradient(traj),
    )


def _zero_cotangent(x):
    """Symbolic-zero cotangent for a primal of any dtype (float0 for
    integer primals, as JAX's custom_vjp calling convention requires)."""
    aval = jax.typeof(x)
    if jax_dtypes.issubdtype(aval.dtype, jnp.inexact):
        return jnp.zeros(aval.shape, aval.dtype)
    return np.zeros(aval.shape, jax_dtypes.float0)


def _make_cached_primal_eps(diff_eps_model: Callable):
    """Cached-primal guided-eps op: the primal *reuses* pass 1's eps
    (bitwise identical — same params, same input latent, same kernels),
    so the differentiable replay's forward does ZERO UNet compute; the
    VJP is the exact vjp of `diff_eps_model` at the same point. This
    removes the K redundant primal forwards the replay otherwise pays
    (and subsumes remat: the backward runs fwd+bwd itself, holding one
    segment's activations at a time).

    `diff_eps_model(diff_tree, aux_tree, x, t) -> eps` must be a pure
    function of its arguments: differentiable inputs travel in
    `diff_tree`; every OTHER traced value (frozen towers) travels in
    `aux_tree`, which receives symbolic-zero cotangents — no cotangent
    compute for frozen weights, and no closed-over tracers (a custom_vjp
    bwd closing over jit-trace tracers fails with "No constant handler
    for DynamicJaxprTracer" when the transpose is traced).
    """

    @jax.custom_vjp
    def op(diff_tree, aux_tree, x, t, cached_eps):
        return cached_eps

    def fwd(diff_tree, aux_tree, x, t, cached_eps):
        return cached_eps, (diff_tree, aux_tree, x, t)

    def bwd(res, g):
        diff_tree, aux_tree, x, t = res
        _, vjp = jax.vjp(
            lambda d, xx: diff_eps_model(d, aux_tree, xx, t), diff_tree, x
        )
        d_diff, d_x = vjp(g)
        d_aux = jax.tree_util.tree_map(_zero_cotangent, aux_tree)
        return d_diff, d_aux, d_x, _zero_cotangent(t), jnp.zeros_like(g)

    op.defvjp(fwd, bwd)
    return op


def _make_capture_only(diff_capture_primal: Callable):
    """Capture-only op for the attrcon segments.

    Captured attention probabilities are genuine primal outputs (the
    grounding loss consumes and differentiates through them), but the
    segment chain's eps already comes from `_make_cached_primal_eps` —
    so the capture op computes ONLY the maps: a cond-half capture
    forward (batch B, not the 2B CFG batch: attention is per-sample, so
    the cond half computes the exact maps the reference's split capture
    call produces — AttrConcenTrainableSDPipeline.py:239-279 — at half
    the cost). The VJP re-runs that cond-half forward and pulls the
    grounding-loss cotangents back into (diff_tree, x) — self-remat:
    no residuals are held across capture calls, and frozen towers
    (aux_tree) get symbolic zeros.

    Decoupling capture from the eps chain is exact: the total gradient
    sum_paths dL/dtheta splits linearly into the eps path (handled by
    the cached-eps op's VJP of the fused-attention guided forward) and
    the maps path (handled here); both VJPs evaluate at the same point.
    It is also what lets capture run at the A=2 attrcon-chosen segments
    only, instead of all K=5 (the reference captures only at
    `attrcon_train_steps` — AttrConcenTrainableSDPipeline.py:159-167;
    capturing at all K and masking was measured as the dominant share
    of a 6.2s/step attrcon tax).
    """

    @jax.custom_vjp
    def op(diff_tree, aux_tree, x, t):
        return diff_capture_primal(diff_tree, aux_tree, x, t)

    def fwd(diff_tree, aux_tree, x, t):
        return diff_capture_primal(diff_tree, aux_tree, x, t), (
            diff_tree, aux_tree, x, t,
        )

    def bwd(res, g):
        diff_tree, aux_tree, x, t = res
        _, vjp = jax.vjp(
            lambda d, xx: diff_capture_primal(d, aux_tree, xx, t),
            diff_tree, x,
        )
        d_diff, d_x = vjp(g)
        d_aux = jax.tree_util.tree_map(_zero_cotangent, aux_tree)
        return d_diff, d_aux, d_x, _zero_cotangent(t)

    op.defvjp(fwd, bwd)
    return op


def sample_comat(
    eps_model: Callable,
    coeffs: SamplerCoeffs,
    latents0: jnp.ndarray,
    rng: jnp.ndarray,
    trained_idx: jnp.ndarray,     # (K,) int32 ascending, stride `interval`
    interval: int,                # static: num_steps // K
    capture: bool = False,
    eps_model_inference=None,     # no-grad variant (e.g. Pallas flash
                                  # attention over stopped params);
                                  # defaults to eps_model
    diff_eps_model: Optional[Callable] = None,
    diff_tree: Any = None,
    aux_tree: Any = None,
    diff_capture_primal: Optional[Callable] = None,
    presampled: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    capture_idx: Optional[jnp.ndarray] = None,
) -> SampleResult:
    """Full two-pass CoMat sampling. Differentiable through the K
    trained steps only (see module docstring).

    With `diff_eps_model(diff_tree, aux_tree, x, t) -> eps` given, the
    replay uses cached-primal segments: pass 1's eps is the primal and
    the segment forward costs nothing (see _make_cached_primal_eps).

    capture=True: attention maps are captured at the `capture_idx`
    (A,)-indexed subset of the K segments ONLY (default: all K), after
    the replay scan — each captured segment gathers its differentiable
    entry latent from the scan's outputs and runs one capture-only
    forward (see _make_capture_only; cond-half batch). This mirrors the
    reference, which captures only at the `attrcon_train_steps` chosen
    steps (AttrConcenTrainableSDPipeline.py:159-167). Captured leaves
    have leading dim A. Grounding-loss cotangents flow through the
    gathered entry latents back into the segment chain, exactly like
    the reference's attn-map gradients. With `diff_capture_primal`
    absent, capture falls back to remat'd eps_model(…, capture=True)
    calls at the same A gathered latents.

    `presampled=(eps_table, latents_traj)`: pass 1 already ran in a
    separate no-grad program (the trainer's presample step, needed when
    a host stage — e.g. Grounded-SAM segmentation — must see the
    generated image before the grad program runs; the axon TPU relay
    has no in-graph host callbacks). The tables are consumed as
    constants and pass 1 is skipped, so sampling is not paid twice;
    identical `rng` makes the replay's noise (and hence its latents)
    bitwise-match the presampled trajectory."""
    S = coeffs.timesteps.shape[0]
    K = trained_idx.shape[0]

    if presampled is not None:
        eps_table, traj = presampled
        eps_table = jax.lax.stop_gradient(eps_table)
        traj = jax.lax.stop_gradient(traj)
    else:
        _, eps_table, traj = sample_inference(
            eps_model_inference
            if eps_model_inference is not None else eps_model,
            coeffs, latents0, rng,
        )

    use_cached_primal = diff_eps_model is not None
    if use_cached_primal:
        cached_eps_op = _make_cached_primal_eps(diff_eps_model)

    # ---- pass 2: differentiable replay ----
    # Cached-primal path: no remat needed — the custom VJP recomputes
    # the segment forward inside its own backward. Fallback path: full
    # remat per trained-step UNet call, keeping residency at one step's
    # activations. (A dots_saveable policy was measured to need 45GB
    # HBM across the K-segment scan — XLA keeps all segments' saved
    # dots live.)
    unet_step = jax.checkpoint(
        lambda x, t: eps_model(x, t, False)[0],
    )

    def segment(x, p):
        entry = x  # differentiable segment-entry latent (capture input)
        # differentiable UNet call at trained position p
        if use_cached_primal:
            eps = cached_eps_op(
                diff_tree, aux_tree, x, coeffs.timesteps[p], eps_table[p]
            )
        else:
            eps = unet_step(x, coeffs.timesteps[p])
        noise = _step_noise(rng, p, x.shape, jnp.float32)
        x, _ = ddpm_step_from_coeffs(coeffs, p, x, eps, noise)

        # replay interval-1 scheduler steps with saved constant eps
        def replay(xc, j):
            pos = p + j
            in_range = pos < S
            safe_pos = jnp.minimum(pos, S - 1)
            eps_c = eps_table[safe_pos]
            noise_c = _step_noise(rng, safe_pos, xc.shape, jnp.float32)
            x_new, _ = ddpm_step_from_coeffs(coeffs, safe_pos, xc, eps_c, noise_c)
            return jnp.where(in_range, x_new, xc), None

        if interval > 1:
            x, _ = jax.lax.scan(replay, x, jnp.arange(1, interval))
        return x, entry

    x0_entry = traj[trained_idx[0]]
    x_final, entry_lat = jax.lax.scan(segment, x0_entry, trained_idx)
    # Positions before the first trained step were consumed in pass 1
    # (no gradient dependence — reference :133 disables grads there).

    # ---- capture at the A chosen segments ----
    captured: Dict[str, Any] = {}
    if capture:
        if capture_idx is None:
            capture_idx = jnp.arange(K)
        A = capture_idx.shape[0]
        if use_cached_primal and diff_capture_primal is not None:
            cap_op = _make_capture_only(diff_capture_primal)
        else:
            cap_fallback = jax.checkpoint(
                lambda x, t: eps_model(x, t, True)[1]
            )
            cap_op = None
        caps = []
        for a in range(A):  # A is static (attrcon_train_steps)
            seg = capture_idx[a]
            x_a = jnp.take(entry_lat, seg, axis=0)
            t_a = coeffs.timesteps[jnp.take(trained_idx, seg)]
            if cap_op is not None:
                caps.append(cap_op(diff_tree, aux_tree, x_a, t_a))
            else:
                caps.append(cap_fallback(x_a, t_a))
        if caps:
            captured = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *caps
            )

    # Tail: when interval*K < S and start > 0... the segments cover
    # [start, start+interval*K); replay any remaining positions up to
    # S-1 with saved eps (masked — tail_max is 0 for the standard
    # K=5/S=50 recipe and this compiles away).
    tail_max = S - interval * K
    if tail_max > 0:
        def tail(xc, j):
            pos = trained_idx[K - 1] + interval + j
            in_range = pos < S
            safe_pos = jnp.minimum(pos, S - 1)
            eps_c = eps_table[safe_pos]
            noise_c = _step_noise(rng, safe_pos, xc.shape, jnp.float32)
            x_new, _ = ddpm_step_from_coeffs(
                coeffs, safe_pos, xc, eps_c, noise_c
            )
            return jnp.where(in_range, x_new, xc), None

        x_final, _ = jax.lax.scan(tail, x_final, jnp.arange(tail_max))

    return SampleResult(
        latents=x_final,
        captured=captured,
        eps_table=eps_table,
        latents_traj=traj,
    )


def prepare_latents(
    rng: jnp.ndarray, batch: int, height: int, width: int,
    channels: int = 4, dtype=jnp.float32,
) -> jnp.ndarray:
    """Initial noise, pre-scaled by init_noise_sigma (DDPM: 1.0)."""
    return jax.random.normal(
        rng, (batch, height // 8, width // 8, channels), dtype
    )
