"""Tool CLI tests: gan_gt_generate end-to-end (tiny) + helper math."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.training.data import GanLatentStore


@pytest.mark.slow
def test_gan_gt_generate_end_to_end(tmp_path):
    from comat_tpu.tools.gan_gt_generate import main

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\na blue bird\nthree cats\n")
    save = tmp_path / "store"
    main([
        "--model", "sd_1_5", "--tiny",
        "--prompt-path", str(prompts),
        "--save-path", str(save),
        "--batch-size", "2",
        "--num-inference-steps", "4",
        "--resolution", "64",
    ])
    index = save / "index.jsonl"
    recs = [json.loads(l) for l in open(index) if l.strip()]
    assert len(recs) == 3
    store = GanLatentStore(str(index))
    lat = store.batch(["a red car", "three cats"])
    assert lat.shape == (2, 8, 8, 4)
    assert np.isfinite(lat).all()

    # --use-cache resumes: nothing left to do
    main([
        "--model", "sd_1_5", "--tiny",
        "--prompt-path", str(prompts),
        "--save-path", str(save),
        "--batch-size", "2",
        "--num-inference-steps", "4",
        "--resolution", "64",
        "--use-cache",
    ])
    recs2 = [json.loads(l) for l in open(index) if l.strip()]
    assert len(recs2) == 3  # no duplicates added

    # native store reads the same index
    try:
        from comat_tpu.native_host import NativeLatentStore

        ns = NativeLatentStore(str(index), latent_elems=8 * 8 * 4)
        lat2 = ns.batch(["a blue bird"])
        assert lat2.shape == (1, 8, 8, 4)
        ns.close()
    except RuntimeError:
        pass  # native lib not built in this environment


def test_sample_trained_idx_distribution():
    """K-schedule (training_script.py:563-566): stride = interval,
    start in [0, max_start]."""
    from comat_tpu.training.train_step import TrainConfig, sample_trained_idx

    cfg = TrainConfig(total_step=50, K=5)
    starts = set()
    for i in range(40):
        idx = np.asarray(sample_trained_idx(jax.random.PRNGKey(i), cfg))
        assert len(idx) == 5
        assert np.all(np.diff(idx) == 10)
        assert 0 <= idx[0] <= 9  # max_start = 50 - 10*4 - 1
        assert idx[-1] < 50
        starts.add(int(idx[0]))
    assert len(starts) > 3  # actually random


def test_rescale_noise_cfg_formula():
    from comat_tpu.diffusion.guidance import rescale_noise_cfg

    k = jax.random.PRNGKey(0)
    cfg_out = jax.random.normal(k, (2, 4, 4, 4)) * 3.0
    text = jax.random.normal(jax.random.fold_in(k, 1), (2, 4, 4, 4))
    w = 0.7
    got = np.asarray(rescale_noise_cfg(cfg_out, text, w))
    c, t = np.asarray(cfg_out, np.float64), np.asarray(text, np.float64)
    axes = (1, 2, 3)
    factor = t.std(axis=axes, keepdims=True) / c.std(axis=axes, keepdims=True)
    want = w * (c * factor) + (1 - w) * c
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_crop_jitter_matches_slice():
    from comat_tpu.losses.caption_reward import crop_jitter

    img = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    out = crop_jitter(img, jnp.asarray(2), jnp.asarray(1), 14)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(img[:, 2:16, 1:15, :])
    )


@pytest.mark.slow
def test_evaluate_cli_tiny(tmp_path):
    """Alignment eval harness end-to-end on tiny models: jsonl rows +
    summary line."""
    import json

    from comat_tpu.tools.evaluate import main as eval_main

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red car\na blue bird\na cat\n")
    out = tmp_path / "res.jsonl"
    eval_main([
        "--prompt-path", str(prompts), "--out", str(out), "--tiny",
        "--num-inference-steps", "3", "--resolution", "64",
        "--batch-size", "2",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 4  # 3 prompts + summary
    # default --metric both: reward + T2I-CompBench-style binding
    assert {"prompt", "blip_reward", "bvqa_binding",
            "bvqa_questions", "bvqa_p_yes"} <= set(lines[0])
    assert lines[0]["bvqa_questions"], "no question for 'a red car'"
    assert all(0.0 <= p <= 1.0 for p in lines[0]["bvqa_p_yes"])
    assert lines[-1]["n"] == 3
    assert np.isfinite(lines[-1]["mean_blip_reward"])
    assert 0.0 <= lines[-1]["mean_bvqa_binding"] <= 1.0


@pytest.mark.slow
def test_parity_synthetic_tier():
    """The one-command parity harness's synthetic tier (no weights
    needed): torch-vs-ours CLIP/BLIP fp32 logit parity + UNet/VAE/CLIP
    converter round-trips must all pass."""
    from comat_tpu.tools import parity

    parity._RESULTS.clear()
    # --skip-twin: the step-loss twin fixture has its own dedicated
    # (and much heavier) test in test_step_loss_fixture.py
    rc = parity.main(["--platform", "cpu", "--skip-twin"])
    assert rc == 0, parity._RESULTS
    status = {name: st for name, st, _ in parity._RESULTS}
    for check in (
        "clip_torch_parity", "blip_torch_parity",
        "blip_vqa_torch_parity",
        "unet_converter_roundtrip", "vae_converter_roundtrip",
        "clip_converter_roundtrip",
    ):
        assert status.get(check) == "PASS", (check, parity._RESULTS)
