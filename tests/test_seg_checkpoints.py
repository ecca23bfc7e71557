"""Checkpoint-file loaders (segmentation/checkpoints.py): torch .pt
round trips through the name converters, with the layout normalization
the released files need (outer 'model' wrapper; ultralytics
'model.{idx}' state-dict prefixes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from comat_tpu.segmentation.checkpoints import (
    load_fastsam_checkpoint,
    load_gdino_checkpoint,
    load_torch_state_dict,
)
from comat_tpu.segmentation.fastsam import YoloSegConfig, YoloV8Seg


def _synthetic_fastsam_state(variables):
    """Random state dict in the FastSAM-x.pt layout, NUMERICALLY SANE:
    fan-in-scaled conv kernels, ~unit running stats. Raw randn weights
    blow activations up to ~1e32 through the deep net, which makes the
    twin-vs-ours VALUE comparison in parity.check_fastsam meaningless
    (any fp32 roundoff is amplified to astronomically large absolute
    deltas); weight-roundtrip assertions are scale-invariant either
    way."""
    from comat_tpu.segmentation.weights_import import fastsam_hf_name

    state = {}
    rng = np.random.RandomState(0)
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            keys = tuple(
                str(getattr(q, "key", getattr(q, "name", q))) for q in path
            )
            name, f = fastsam_hf_name(keys, coll)
            shp = leaf.shape
            if f.__name__ == "_conv":
                src = rng.randn(shp[3], shp[2], shp[0], shp[1])
                src *= float(np.prod(shp[:3])) ** -0.5
            elif f.__name__ == "_convT":
                src = rng.randn(shp[2], shp[3], shp[0], shp[1])
                src *= float(np.prod((shp[0], shp[1], shp[2]))) ** -0.5
            elif len(shp) >= 2:
                src = rng.randn(*shp) * float(np.prod(shp[:-1])) ** -0.5
            else:
                src = rng.randn(*shp) * 0.1
            if name.endswith("running_var"):
                src = np.abs(src) + 1.0
            if name.endswith("running_mean"):
                src = src * 0.1
            state[name] = src.astype(np.float32)
    return state


def test_fastsam_pt_file_roundtrip(tmp_path):
    """Both released layouts load: raw 'model.model.N' names and the
    DetectionModel.state_dict() 'model.N' names, wrapped in {'model':}."""
    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    state = _synthetic_fastsam_state(variables)

    raw = tmp_path / "fastsam_raw.pt"
    torch.save({k: torch.tensor(v) for k, v in state.items()}, str(raw))
    loaded, missing = load_fastsam_checkpoint(str(raw), variables)
    assert not missing, missing[:5]
    got = np.asarray(loaded["params"]["stem"]["conv"]["kernel"])
    want = np.transpose(state["model.model.0.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)

    # state-dict-of-DetectionModel layout: strip one 'model.' level
    short = {
        k[len("model."):]: torch.tensor(v) for k, v in state.items()
    }
    wrapped = tmp_path / "fastsam_wrapped.pt"
    torch.save({"model": short, "epoch": 0}, str(wrapped))
    loaded2, missing2 = load_fastsam_checkpoint(str(wrapped), variables)
    assert not missing2, missing2[:5]
    np.testing.assert_allclose(
        np.asarray(loaded2["params"]["stem"]["conv"]["kernel"]), want
    )


def test_gdino_pth_file_roundtrip(tmp_path):
    """The GroundingDINO release layout ({'model': state_dict} with
    'module.' prefixes) loads through the file loader."""
    from tests.test_grounded_sam import _synthetic_gdino_state_dict
    from comat_tpu.segmentation.gdino import GDinoConfig, GroundingDetector

    cfg = GDinoConfig.tiny_swin()
    det = GroundingDetector(cfg)
    img = jnp.zeros((1, 128, 128, 3))
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), bool)
    variables = jax.eval_shape(
        lambda k: det.init(k, img, ids, mask), jax.random.PRNGKey(0)
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    sd, unmapped = _synthetic_gdino_state_dict(variables)
    assert not unmapped, unmapped[:5]

    path = tmp_path / "gdino.pth"
    torch.save(
        {"model": {"module." + k: torch.tensor(v) for k, v in sd.items()}},
        str(path),
    )
    loaded, missing = load_gdino_checkpoint(str(path), variables)
    assert not missing, missing[:5]


def test_load_torch_state_dict_plain(tmp_path):
    p = tmp_path / "plain.pt"
    torch.save({"a.weight": torch.ones(2, 3)}, str(p))
    sd = load_torch_state_dict(str(p))
    assert sd["a.weight"].shape == (2, 3)
