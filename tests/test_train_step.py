"""End-to-end train step on tiny CPU models: the 'minimum slice' of
BASELINE.json config 1 (SD1.5 concept-matching only), plus the 8-device
data-parallel mesh run."""

import pytest

pytestmark = pytest.mark.slow  # expensive e2e jit compiles

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.config import BLIPConfig
from comat_tpu.models.blip import BLIPCaptioner
from comat_tpu.models.pipeline import DiffusionPipeline, make_pipeline_config
from comat_tpu.losses.caption_reward import build_caption_batch
from comat_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from comat_tpu.text.tokenizer import HashTokenizer
from comat_tpu.training.train_step import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
    partition_params,
    merge_params,
)

RES = 64  # latent 8 with the tiny UNet (8 -> 4 -> 2 -> 1 is too small; 8 ok)


def _build(batch_size):
    pcfg = make_pipeline_config("sd_1_5", lora_rank=4, resolution=RES, tiny=True)
    pipe = DiffusionPipeline(pcfg)
    blip_cfg = BLIPConfig.tiny()
    blip = BLIPCaptioner(blip_cfg)
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)

    tok = HashTokenizer(1000)
    prompts = ["a red car and a blue bird", "two cats on a mat"][:batch_size] * (
        max(1, batch_size // 2)
    )
    prompts = prompts[:batch_size]
    enc = tok(prompts, max_length=pcfg.text.max_length)
    null = tok([""] * batch_size, max_length=pcfg.text.max_length)
    cap = build_caption_batch(tok, prompts)
    # pad captions to a fixed bucket (jit-stable)
    S = 24
    pad = lambda a, v: np.pad(a, ((0, 0), (0, S - a.shape[1])), constant_values=v)
    batch = {
        "input_ids": jnp.asarray(enc["input_ids"]),
        "eos_positions": jnp.asarray(enc["eos_positions"]),
        "null_ids": jnp.asarray(null["input_ids"]),
        "caption_ids": jnp.asarray(pad(cap["input_ids"], 0)),
        "caption_mask": jnp.asarray(pad(cap["attention_mask"], 0)),
        "caption_labels": jnp.asarray(pad(cap["labels"], -100)),
    }
    blip_params = blip.init(
        k, jnp.zeros((1, blip_cfg.image_size, blip_cfg.image_size, 3)),
        batch["caption_ids"][:1], batch["caption_mask"][:1],
        batch["caption_labels"][:1],
    )
    tcfg = TrainConfig(
        total_step=10, K=3, resolution=RES, learning_rate=1e-3,
        norm_grad=False,
    )
    return pipe, blip, params, blip_params, batch, tcfg


def test_train_step_end_to_end():
    pipe, blip, params, blip_params, batch, tcfg = _build(2)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt))
    rng = jax.random.PRNGKey(42)

    state2, _, metrics = step(state, frozen, blip_params, batch, rng)
    assert int(state2.step) == 1
    for key in ["step_loss", "reward_blip", "reward_norm", "grad_norm"]:
        assert np.isfinite(float(metrics[key])), key

    # LoRA-b grads are nonzero -> params move; frozen untouched
    def lora_b_norm(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return sum(
            float(jnp.abs(v).sum())
            for p, v in flat
            if v is not None and any(getattr(q, "key", None) == "lora_b" for q in p)
        )

    assert lora_b_norm(state2.trainable) > 0  # moved off zero-init

    # second step advances and stays finite
    state3, _, metrics3 = step(state2, frozen, blip_params, batch, rng)
    assert np.isfinite(float(metrics3["step_loss"]))


def test_forward_cached_primal_matches_merged_path():
    """pipeline.forward with the (trainable, frozen) partition
    (cached-primal replay) must produce the same image and the same
    LoRA gradients as the merged-params (remat replay) path."""
    pipe, _, params, _, batch, tcfg = _build(2)
    trainable, frozen = partition_params(params)
    rng = jax.random.PRNGKey(3)
    trained_idx = jnp.arange(1, 1 + tcfg.K * tcfg.interval, tcfg.interval)

    def image_sum(tr, use_partition):
        p = merge_params(tr, frozen)
        kw = dict(trainable=tr, frozen=frozen) if use_partition else {}
        img, _ = pipe.forward(
            p, rng, batch["input_ids"], batch["null_ids"], trained_idx,
            num_inference_steps=tcfg.total_step, K=tcfg.K,
            guidance_scale=tcfg.guidance_scale,
            eos_positions=batch["eos_positions"], **kw,
        )
        return (img.astype(jnp.float32) ** 2).mean()

    # jitted: custom_vjp tracer-leak bugs only surface under jit
    v1, g1 = jax.jit(jax.value_and_grad(lambda t: image_sum(t, True)))(
        trainable
    )
    v2, g2 = jax.value_and_grad(lambda t: image_sum(t, False))(trainable)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    l1 = [x for x in jax.tree_util.tree_leaves(g1)]
    l2 = [x for x in jax.tree_util.tree_leaves(g2)]
    assert len(l1) == len(l2) and len(l1) > 0
    total = 0.0
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )
        total += float(jnp.abs(a).sum())
    assert total > 0


def test_partition_merge_roundtrip():
    pipe, _, params, _, _, _ = _build(2)
    t, f = partition_params(params)
    merged = merge_params(t, f)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(params)):
        assert a is b


def test_train_step_data_parallel_mesh():
    """8-device DP: batch sharded over 'data', params replicated; the
    gradient mean is GSPMD-inserted. Mirrors the driver's
    dryrun_multichip validation."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    pipe, blip, params, blip_params, batch, tcfg = _build(8)
    mesh = make_mesh(data=8, model=1)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)

    state = replicate_tree(state, mesh)
    frozen = replicate_tree(frozen, mesh)
    blip_params = replicate_tree(blip_params, mesh)
    sbatch = shard_batch(batch, mesh)
    # null_ids/caption rows are per-sample too in this batch
    step = jax.jit(make_train_step(pipe, blip, tcfg, opt))
    rng = jax.device_put(
        jax.random.PRNGKey(0), NamedSharding(mesh, P())
    )
    state2, _, metrics = step(state, frozen, blip_params, sbatch, rng)
    assert np.isfinite(float(metrics["step_loss"]))
    # updated params must be replicated (no accidental sharding)
    leaf = jax.tree_util.tree_leaves(state2.trainable)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_step_dp_plus_tp_mesh():
    """4x2 mesh: batch over 'data', attention projections sharded over
    'model' (Megatron pattern via param shardings only)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from comat_tpu.parallel.tp import tp_param_shardings

    pipe, blip, params, blip_params, batch, tcfg = _build(4)
    mesh = make_mesh(data=4, model=2)
    opt = make_optimizer(tcfg)
    state, frozen = init_train_state(params, tcfg, opt)

    # shard frozen + trainable with TP rules, replicate the rest
    frozen = jax.device_put(frozen, tp_param_shardings(frozen, mesh))
    state = state._replace(
        trainable=jax.device_put(
            state.trainable, tp_param_shardings(state.trainable, mesh)
        ),
        opt_state=replicate_tree(state.opt_state, mesh),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )
    blip_params = replicate_tree(blip_params, mesh)
    sbatch = shard_batch(batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))

    step = jax.jit(make_train_step(pipe, blip, tcfg, opt))
    state2, _, metrics = step(state, frozen, blip_params, sbatch, rng)
    assert np.isfinite(float(metrics["step_loss"]))
    # at least one frozen attention kernel is actually sharded on model
    flat = jax.tree_util.tree_flatten_with_path(frozen)[0]
    sharded = [
        v for p, v in flat
        if v is not None
        and any(getattr(q, "key", None) == "to_q" for q in p)
        and not v.sharding.is_fully_replicated
    ]
    assert sharded, "expected to_q kernels sharded over model axis"
    # GEGLU FF: fused value|gate kernel column-parallel on its LAST
    # axis (value/gate co-sharded), proj_out row-parallel
    def _keys(p):
        return [str(getattr(q, "key", q)) for q in p]

    ff_in = [
        (p, v) for p, v in flat
        if v is not None and "ff" in _keys(p) and "proj_in" in _keys(p)
        and _keys(p)[-1] == "kernel"
    ]
    ff_out = [
        (p, v) for p, v in flat
        if v is not None and "ff" in _keys(p) and "proj_out" in _keys(p)
        and _keys(p)[-1] == "kernel"
    ]
    assert ff_in and ff_out
    for p, v in ff_in:
        assert v.ndim == 3
        assert v.sharding.spec == P(None, None, "model"), (p, v.sharding)
    for p, v in ff_out:
        assert v.sharding.spec == P("model", None), (p, v.sharding)


def test_textenc_lr_group():
    """--textenc_lora_lr: text-encoder leaves update with their own LR
    (reference training_script.py:239-252)."""
    import optax

    tcfg = TrainConfig(learning_rate=1e-2, textenc_lr=1e-4,
                       adam_weight_decay=0.0, max_grad_norm=1e9)
    opt = make_optimizer(tcfg)
    params = {"unet": jnp.ones((4,)), "text": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"unet": jnp.ones((4,)), "text": jnp.ones((4,))}
    updates, _ = opt.update(grads, state, params)
    # first Adam step is -lr * sign-ish: ratio of magnitudes = lr ratio
    r = float(jnp.abs(updates["unet"][0]) / jnp.abs(updates["text"][0]))
    np.testing.assert_allclose(r, 100.0, rtol=1e-3)


def test_v_prediction_pipeline_generates():
    """prediction_type='v_prediction' runs the full pipeline (the
    conversion sits at the unet_apply boundary)."""
    from comat_tpu.models.pipeline import (
        DiffusionPipeline, make_pipeline_config,
    )
    from comat_tpu.text.tokenizer import HashTokenizer

    pcfg = make_pipeline_config(
        "sd_1_5", lora_rank=0, resolution=RES, tiny=True,
        prediction_type="v_prediction",
    )
    pipe = DiffusionPipeline(pcfg)
    k = jax.random.PRNGKey(0)
    params = pipe.init_params(k)
    tok = HashTokenizer(1000)
    enc = tok(["a cat"], max_length=pcfg.text.max_length)
    null = tok([""], max_length=pcfg.text.max_length)
    img = pipe.generate(
        params, k, jnp.asarray(enc["input_ids"]),
        jnp.asarray(null["input_ids"]), num_inference_steps=4,
        eos_positions=jnp.asarray(enc["eos_positions"]),
    )
    assert img.shape == (1, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_gradient_checkpointing_matches():
    """--gradient_checkpointing (block remat in the replay UNet) must
    not change values or gradients, only memory."""
    pipe, _, params, _, batch, tcfg = _build(2)
    trainable, frozen = partition_params(params)
    rng = jax.random.PRNGKey(5)
    trained_idx = jnp.arange(1, 1 + tcfg.K * tcfg.interval, tcfg.interval)

    def image_sum(tr, remat):
        p = merge_params(tr, frozen)
        img, _ = pipe.forward(
            p, rng, batch["input_ids"], batch["null_ids"], trained_idx,
            num_inference_steps=tcfg.total_step, K=tcfg.K,
            guidance_scale=tcfg.guidance_scale,
            eos_positions=batch["eos_positions"],
            trainable=tr, frozen=frozen, remat=remat,
        )
        return (img.astype(jnp.float32) ** 2).mean()

    v1, g1 = jax.jit(
        jax.value_and_grad(lambda t: image_sum(t, True))
    )(trainable)
    v2, g2 = jax.jit(
        jax.value_and_grad(lambda t: image_sum(t, False))
    )(trainable)
    # selective remat (--remat_min_res): int level recomputes only the
    # blocks at spatial res >= it — here the full-latent-res blocks,
    # the config that fits the SD1.5 512px full recipe in 16GB HBM
    v3, g3 = jax.jit(
        jax.value_and_grad(
            lambda t: image_sum(t, pipe.cfg.latent_size)
        )
    )(trainable)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(float(v3), float(v2), rtol=1e-6)
    for a, b, c in zip(jax.tree_util.tree_leaves(g1),
                       jax.tree_util.tree_leaves(g2),
                       jax.tree_util.tree_leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(c), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_pass1_without_lora_fusion_matches():
    """fuse_pass1=False (memory-tight mode, used with
    --gradient_checkpointing) must produce identical images — the
    per-token LoRA path and the folded-kernel path compute the same
    function."""
    pipe, _, params, _, batch, tcfg = _build(2)
    rng = jax.random.PRNGKey(9)
    trained_idx = jnp.arange(1, 1 + tcfg.K * tcfg.interval, tcfg.interval)

    def img(fuse):
        out, _ = pipe.forward(
            params, rng, batch["input_ids"], batch["null_ids"],
            trained_idx, num_inference_steps=tcfg.total_step, K=tcfg.K,
            guidance_scale=tcfg.guidance_scale,
            eos_positions=batch["eos_positions"], fuse_pass1=fuse,
        )
        return np.asarray(out)

    np.testing.assert_allclose(img(True), img(False), rtol=2e-4,
                               atol=2e-5)
