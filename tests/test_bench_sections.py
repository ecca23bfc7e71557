"""Fast-tier tests of bench.py's section protocol (no device).

Round-4 run2 lost every post-headline number to one RESOURCE_EXHAUSTED
cascading through the shared process. The fix routes each measurement
family through its own subprocess + a BENCH_SECTIONS.json merge; these
tests pin the pure plumbing — section merge atomicity, assembly from
partial/complete section sets, and the fallback-record gate — so the
round-end bench can't regress without a test going red.
"""

import json

import pytest

import bench

HEADLINE = {
    "dt_full": 5.184,
    "remat_used": 64,
    "f_img": 113.09e12,
    "comp": {
        "unet_cfg_fwd": 6.6e12,
        "vae_decode": 7.0e12,
        "blip_reward": 1.7e12,
        "d_fwd": 6.6e12,
    },
    "step_loss": 0.982,
}


def test_assemble_requires_headline():
    assert bench._assemble({}, 4, "sd_1_5") is None
    assert bench._assemble({"pass1": {"t_pass1": 3.0}}, 4, "sd_1_5") is None
    assert (
        bench._assemble({"headline": {"dt_full": None}}, 4, "sd_1_5")
        is None
    )


def test_assemble_headline_only():
    rec = bench._assemble({"headline": HEADLINE}, 4, "sd_1_5")
    assert rec["value"] == round(4 / 5.184, 4)
    assert rec["unit"] == "images/sec/chip"
    assert rec["metric"].startswith("sd15_")
    d = rec["detail"]
    assert d["step_seconds_full_recipe"] == 5.184
    assert d["remat_min_res"] == 64
    # everything unmeasured stays explicitly null, never KeyErrors
    assert d["step_seconds_full_recipe_int8"] is None
    assert d["step_seconds_gsam_recipe"] is None
    assert d["sdxl"] is None
    assert d["step_seconds_reduced"] is None
    # vs_baseline derives from the headline's own analytic FLOPs
    a100 = bench.A100_PEAK_FLOPS * bench.A100_ASSUMED_MFU / HEADLINE["f_img"]
    assert rec["vs_baseline"] == round(rec["value"] / a100, 3)


def test_assemble_full_sections():
    sections = {
        "headline": HEADLINE,
        "pass1": {"t_pass1": 3.004, "t_pass1_int8": 2.843},
        "phases": {
            "vae_decode_fwd": 0.127,
            "vae_decode_fwd_plus_bwd": 0.315,
            "blip_reward_fwd": 0.024,
            "blip_reward_fwd_plus_bwd": 0.054,
            "gan_G_side_fwd_plus_bwd": 0.109,
            "gan_D_update_fwd_plus_bwd": 0.187,
            "attrcon_capture_plus_grounding_one_seg_fwd": 0.065,
        },
        "gsam": {"presample": 3.1, "gsam_masks": 0.6,
                 "step_with_tables": 2.1, "total": 5.8},
        "int8": {"dt_int8": 5.02, "loss_delta": 3e-4},
        "reduced": {"dt_reduced": 4.02},
        "sdxl": {"step_seconds_full_recipe": 9.8, "imgs_per_sec": 0.408},
        "_device": "TPU v5 lite0",
    }
    rec = bench._assemble(sections, 4, "sd_1_5")
    d = rec["detail"]
    assert d["step_seconds_full_recipe_int8"] == 5.02
    assert d["int8_step_loss_delta"] == 3e-4
    assert d["step_seconds_gsam_recipe"] == 5.8
    assert d["imgs_per_sec_gsam_recipe"] == round(4 / 5.8, 4)
    assert d["sdxl"]["step_seconds_full_recipe"] == 9.8
    assert d["step_seconds_reduced"] == 4.02
    assert d["device"] == "TPU v5 lite0"
    pb = d["phase_breakdown"]
    # subtraction diagnostics appear once reduced + pass1 + phases exist
    assert "replay_K_vjp_plus_opt" in pb
    assert "attrcon_capture_plus_grounding" in pb
    # per-phase achieved TF/s computed against the headline's FLOPs
    assert pb["pass1_50_fused_fwd"]["s"] == 3.004
    assert pb["pass1_50_fused_fwd"]["tf_per_s"] == pytest.approx(
        50 * 6.6e12 / 3.004 / 1e12, rel=1e-3
    )


def test_section_merge_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SECTIONS_PATH",
                        str(tmp_path / "BENCH_SECTIONS.json"))
    assert bench._load_sections() == {}
    bench._merge_section("headline", HEADLINE)
    bench._merge_section("pass1", {"t_pass1": 3.0})
    # a later merge must not clobber earlier sections
    sec = bench._load_sections()
    assert sec["headline"]["dt_full"] == 5.184
    assert sec["pass1"]["t_pass1"] == 3.0
    # corrupt file degrades to empty, not a crash
    (tmp_path / "BENCH_SECTIONS.json").write_text("{broken")
    assert bench._load_sections() == {}


def test_fallback_record_gates(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    metric = "sd15_comat_full_recipe_train_step_throughput_512px"
    # no file -> None
    assert bench._fallback_record(metric, "n") is None
    p = tmp_path / "BENCH_MEASURED.json"
    # wrong metric -> None
    p.write_text(json.dumps({"metric": "other", "value": 1.0}))
    assert bench._fallback_record(metric, "n") is None
    # null value -> None (a fallback must be a real measurement)
    p.write_text(json.dumps({"metric": metric, "value": None}))
    assert bench._fallback_record(metric, "n") is None
    rec = {"metric": metric, "value": 0.77, "detail": {}}
    p.write_text(json.dumps(rec))
    got = bench._fallback_record(metric, "outage note")
    assert got["value"] == 0.77
    assert got["detail"]["note"] == "outage note"


def test_section_fns_cover_orchestrator_names():
    for name in ("headline", "pass1", "phases", "gsam", "int8",
                 "reduced", "sdxl"):
        assert name in bench._SECTION_FNS


def test_merge_prior_detail_fills_null_leaves(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    metric = "sd15_comat_full_recipe_train_step_throughput_512px"
    prior = {
        "metric": metric,
        "value": 0.77,
        "detail": {
            "batch_size": 4,
            "step_seconds_gsam_recipe": 9.1,
            "sdxl": {"dt_full": 7.0},
            "device": "TPU v5 lite0",
            "note": "old note",
            "phase_breakdown": {
                "pass1_50_fused_fwd": {"s": 3.0},
                "gan_D_update_fwd_plus_bwd": {"s": 0.19},
            },
        },
    }
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    fresh = {
        "metric": metric,
        "value": 0.78,
        "detail": {
            "batch_size": 4,
            "step_seconds_gsam_recipe": None,
            "sdxl": None,
            "step_seconds_full_recipe": 5.1,
            "device": "TPU v5 lite0",
            "phase_breakdown": {"pass1_50_fused_fwd": {"s": 2.9}},
        },
    }
    got = bench._merge_prior_detail(fresh)
    d = got["detail"]
    # null leaves filled from the prior record, provenance listed
    assert d["step_seconds_gsam_recipe"] == 9.1
    assert d["sdxl"] == {"dt_full": 7.0}
    assert sorted(d["prior_run_fields"]) == [
        "phase_breakdown.gan_D_update_fwd_plus_bwd",
        "sdxl",
        "step_seconds_gsam_recipe",
    ]
    # fresh non-null values and note are never overwritten
    assert d["step_seconds_full_recipe"] == 5.1
    assert "note" not in d
    # per-phase merge keeps the fresh phase, adds the missing one
    assert d["phase_breakdown"]["pass1_50_fused_fwd"]["s"] == 2.9
    assert d["phase_breakdown"]["gan_D_update_fwd_plus_bwd"]["s"] == 0.19


def test_merge_prior_detail_gates(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    fresh = {"metric": "m", "value": 1.0, "detail": {"x": None}}
    # no prior file -> unchanged
    assert bench._merge_prior_detail(dict(fresh))["detail"]["x"] is None
    # metric mismatch -> unchanged
    (tmp_path / "BENCH_MEASURED.json").write_text(
        json.dumps({"metric": "other", "detail": {"x": 5}})
    )
    got = bench._merge_prior_detail(json.loads(json.dumps(fresh)))
    assert got["detail"]["x"] is None
    assert "prior_run_fields" not in got["detail"]


def test_merge_prior_detail_gates_batch_and_device(tmp_path, monkeypatch):
    """ADVICE r4: a prior record measured at a different batch size or
    on different hardware must not donate numbers."""
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    prior = {"metric": "m", "value": 0.7,
             "detail": {"batch_size": 8, "device": "TPU v5 lite0",
                        "x": 5.0}}
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    fresh = {"metric": "m", "value": 1.0,
             "detail": {"batch_size": 4, "device": "TPU v5 lite0",
                        "x": None}}
    got = bench._merge_prior_detail(json.loads(json.dumps(fresh)))
    assert got["detail"]["x"] is None  # batch mismatch
    prior["detail"]["batch_size"] = 4
    prior["detail"]["device"] = "TPU v6"
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    got = bench._merge_prior_detail(json.loads(json.dumps(fresh)))
    assert got["detail"]["x"] is None  # device mismatch
    prior["detail"]["device"] = "TPU v5 lite0"
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    got = bench._merge_prior_detail(json.loads(json.dumps(fresh)))
    assert got["detail"]["x"] == 5.0  # both match -> merge


def test_merge_prior_detail_remat_rides_with_timing(tmp_path, monkeypatch):
    """ADVICE r4: None is a meaningful remat level ('ran remat-free');
    a fresh remat-free measurement must NOT inherit the prior run's
    remat level. The level is copied only when its paired timing was."""
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    metric = "m"
    prior = {"metric": metric, "value": 0.7, "detail": {
        "step_seconds_full_recipe_int8": 5.0, "int8_remat_min_res": 64,
        "step_seconds_full_recipe": 5.2, "remat_min_res": 64,
    }}
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    # fresh run measured int8 REMAT-FREE: its None level must survive
    fresh = {"metric": metric, "value": 0.8, "detail": {
        "step_seconds_full_recipe_int8": 4.6, "int8_remat_min_res": None,
        "step_seconds_full_recipe": None, "remat_min_res": None,
    }}
    got = bench._merge_prior_detail(json.loads(json.dumps(fresh)))
    d = got["detail"]
    assert d["int8_remat_min_res"] is None          # fresh measurement wins
    assert d["step_seconds_full_recipe"] == 5.2     # timing copied...
    assert d["remat_min_res"] == 64                 # ...so its level rides
    assert "step_seconds_full_recipe" in d["prior_run_fields"]
    assert "int8_remat_min_res" not in d["prior_run_fields"]


def test_merge_prior_detail_fresh_schema_is_authoritative(
        tmp_path, monkeypatch):
    """ADVICE r4: keys removed from _assemble's schema must not be
    resurrected from old records forever."""
    monkeypatch.setattr(bench, "_HERE", str(tmp_path))
    prior = {"metric": "m", "value": 0.7,
             "detail": {"renamed_old_field": 3.0}}
    (tmp_path / "BENCH_MEASURED.json").write_text(json.dumps(prior))
    fresh = {"metric": "m", "value": 1.0, "detail": {"x": None}}
    got = bench._merge_prior_detail(fresh)
    assert "renamed_old_field" not in got["detail"]
