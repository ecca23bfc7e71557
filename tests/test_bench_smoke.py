"""CPU smoke test of bench.py's measurement plumbing on tiny geometry.

Round 2's per-phase breakdown crashed mid-bench (relay HTTP 413) and
shipped incomplete (BENCH_r02.json `tail`) — nothing exercised the
bench code before the round-end run. This guards every measurement
path (full/reduced step measure, the failure-isolated per-phase
breakdown incl. the attrcon capture+grounding phase, the pass-1 int8
variant, the end-to-end --pass1_int8 build, and the gsam-recipe
presample -> host masks -> table-replay sequence) so a code change
can't silently break the round-end benchmark again. Real numbers come
from `python bench.py` on TPU hardware.
"""

import numpy as np
import pytest

import bench

pytestmark = pytest.mark.slow  # many e2e jit compiles; ~10 min on 1 core

B = 2
RES = 64  # latent 8 — the tiny UNet's floor (test_train_step.py:29)


@pytest.fixture(scope="module")
def full_built():
    return bench.build(B, resolution=RES, model="sd_1_5",
                       full_recipe=True, tiny=True)


@pytest.fixture(scope="module")
def measured(full_built):
    dt, state, d_state, m0 = bench.measure(full_built, n_iters=1)
    return dt, state, d_state, m0


def test_full_recipe_measure(measured):
    dt, _, _, m0 = measured
    assert dt > 0
    assert np.isfinite(float(m0["step_loss"]))


def test_phase_breakdown_covers_every_phase(full_built, measured):
    (pipe, blip, _, _, frozen, blip_params, batch, tcfg,
     disc, _, d_frozen) = full_built
    _, state, d_state, _ = measured
    phases = bench.phase_seconds_breakdown(
        pipe, blip, state, frozen, blip_params, batch, tcfg=tcfg,
        disc=disc, d_state=d_state, d_frozen=d_frozen,
    )
    for key in (
        "vae_decode_fwd",
        "vae_decode_fwd_plus_bwd",
        "blip_reward_fwd",
        "blip_reward_fwd_plus_bwd",
        "gan_G_side_fwd_plus_bwd",
        "gan_D_update_fwd_plus_bwd",
        "attrcon_capture_plus_grounding_one_seg_fwd",
        "attrcon_capture_plus_grounding_one_seg_fwd_plus_bwd",
    ):
        assert key in phases, f"phase '{key}' missing: {sorted(phases)}"
        assert phases[key] > 0


def test_phase_breakdown_isolates_failures():
    """One broken phase must not wipe the rest (the r2 HTTP 413 mode)."""
    out = {}
    bench._phase(out, "boom", lambda: (_ for _ in ()).throw(RuntimeError), ())
    bench._phase(out, "ok", lambda x: x + 1, (np.float32(1.0),), iters=1)
    assert "boom" not in out and "ok" in out


def test_pass1_bf16_and_int8(full_built, measured):
    (pipe, _, _, _, frozen, _, batch, _, _, _, _) = full_built
    _, state, _, _ = measured
    t_bf16 = bench.pass1_seconds(pipe, state, frozen, batch)
    t_int8 = bench.pass1_seconds(pipe, state, frozen, batch, int8=True)
    assert t_bf16 > 0 and t_int8 > 0


def test_int8_full_step_loss_delta():
    """The measured --pass1_int8 step: same seeded init/batch/rng as
    the bf16 build, finite loss, reproducible delta."""
    b8 = bench.build(B, resolution=RES, model="sd_1_5",
                     full_recipe=True, pass1_int8=True, tiny=True)
    _, _, _, m8 = bench.measure(b8, n_iters=1)
    assert np.isfinite(float(m8["step_loss"]))


def _orchestrate(tmp_path, budget="1", measured_value=0.77,
                 sigterm_after_first_line=False):
    """Run `python bench.py` as the driver does, against a temp
    BENCH_HOME seeded with a prior measured record. Returns the list of
    parsed stdout JSON lines."""
    import json
    import os
    import signal
    import subprocess
    import sys

    metric = "sd15_comat_full_recipe_train_step_throughput_512px"
    prior = {"metric": metric, "value": measured_value,
             "unit": "images/sec/chip", "vs_baseline": 0.7,
             "detail": {"batch_size": 4, "device": "cpu-test"}}
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    env = dict(os.environ)
    env["BENCH_HOME"] = str(tmp_path)
    env["BENCH_TOTAL_BUDGET_S"] = budget
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.Popen(
        [sys.executable, os.path.join(here, "bench.py")],
        stdout=subprocess.PIPE, text=True, env=env, cwd=here,
    )
    first = p.stdout.readline()
    if sigterm_after_first_line:
        p.send_signal(signal.SIGTERM)
    rest = p.stdout.read()
    p.wait(timeout=180)
    lines = [ln for ln in ([first] + rest.splitlines()) if ln.strip()]
    return [json.loads(ln) for ln in lines]


def test_orchestrator_pre_run_emission(tmp_path):
    """VERDICT r4 #1: stdout must carry a parseable non-null record
    within the first seconds, BEFORE any device work — killing the
    process at any later moment still leaves the driver a number."""
    recs = _orchestrate(tmp_path, budget="1")
    assert recs, "no JSON lines on stdout"
    assert recs[0]["value"] == 0.77
    assert recs[0]["detail"]["source"] == "fallback_pre_run"
    # the final line (budget exhausted -> no live headline) re-emits
    # the prior measured record, never a null
    assert recs[-1]["value"] == 0.77


def test_orchestrator_sigterm_emits_best_known(tmp_path):
    """The driver's timeout delivers SIGTERM; the orchestrator must
    emit best-known-so-far instead of dying silent."""
    recs = _orchestrate(tmp_path, budget="600",
                        sigterm_after_first_line=True)
    assert recs[0]["detail"]["source"] == "fallback_pre_run"
    assert recs[-1]["value"] == 0.77
    note = recs[-1]["detail"].get("note", "")
    assert "signal" in note


def test_gsam_recipe_sequence(full_built, measured):
    (pipe, _, step, _, frozen, blip_params, batch, tcfg,
     _, _, d_frozen) = full_built
    _, state, d_state, _ = measured
    # the step donates its state/d_state args; deep-copy the module-
    # scoped fixture buffers so test order can't expose deleted buffers
    # to later tests (ADVICE r3)
    import jax
    import jax.numpy as jnp
    state = jax.tree_util.tree_map(jnp.copy, state)
    d_state = jax.tree_util.tree_map(jnp.copy, d_state)
    gsam, state, d_state = bench.gsam_recipe_seconds(
        pipe, step, state, frozen, blip_params, batch, tcfg,
        d_state, d_frozen, n_iters=1, tiny=True,
    )
    assert set(gsam) == {"presample", "gsam_masks", "step_with_tables",
                         "total"}
    assert gsam["total"] >= gsam["step_with_tables"]
