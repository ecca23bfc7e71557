"""FastSAM (YOLOv8-seg) forward + decode + box_prompt tests (tiny,
random weights — structural/shape validation; weight-parity needs real
checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comat_tpu.segmentation.fastsam import (
    YoloSegConfig,
    YoloV8Seg,
    box_prompt_masks,
    decode_predictions,
    _nms,
)


@pytest.mark.slow
def test_yolov8seg_shapes():
    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs, protos = model.apply(params, img)
    assert protos.shape == (1, 16, 16, cfg.num_masks)
    assert len(outs) == 3
    assert outs[0]["box"].shape == (1, 8, 8, 4 * cfg.reg_max)
    assert outs[0]["cls"].shape == (1, 8, 8, 1)
    assert outs[0]["mc"].shape == (1, 8, 8, cfg.num_masks)
    assert outs[2]["box"].shape[1] == 2  # stride 32


def test_decode_and_box_prompt():
    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), img)
    outs, protos = model.apply(params, img)
    res = decode_predictions(outs, protos, cfg, conf_thresh=0.0,
                             iou_thresh=0.99, max_det=10)
    assert len(res) == 1
    r = res[0]
    assert r["boxes"].shape[1] == 4
    assert r["masks"].shape[0] == r["boxes"].shape[0]
    mask = box_prompt_masks(r, [8, 8, 40, 40], (64, 64))
    assert mask.shape == (64, 64)


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, iou=0.5)
    assert list(keep) == [0, 2]


def test_fastsam_weight_mapping_coverage():
    """Every param/batch_stat leaf maps to an ultralytics name, and a
    synthetic state dict round-trips values."""
    from comat_tpu.segmentation.weights_import import (
        fastsam_hf_name, load_fastsam_params,
    )

    cfg = YoloSegConfig.tiny()
    model = YoloV8Seg(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)

    # coverage: every leaf maps, names unique per collection
    state = {}
    rng = np.random.RandomState(0)
    for coll in ("params", "batch_stats"):
        names = set()
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat:
            keys = tuple(
                str(getattr(q, "key", getattr(q, "name", q))) for q in path
            )
            res = fastsam_hf_name(keys, coll)
            assert res is not None, f"{coll}: unmapped {'/'.join(keys)}"
            name, f = res
            assert name not in names, f"dup {name}"
            names.add(name)
            # invert layout for synthetic source tensor
            shp = leaf.shape
            if f.__name__ == "_conv":
                src = rng.randn(shp[3], shp[2], shp[0], shp[1])
            elif f.__name__ == "_convT":
                src = rng.randn(shp[2], shp[3], shp[0], shp[1])
            else:
                src = rng.randn(*shp)
            if name.endswith("running_var"):
                src = np.abs(src) + 0.1
            state[name] = src.astype(np.float32)

    loaded, missing = load_fastsam_params(state, variables)
    assert not missing, missing[:5]
    # spot value check: stem conv kernel
    got = np.asarray(loaded["params"]["stem"]["conv"]["kernel"])
    want = np.transpose(state["model.model.0.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want)
    # outputs still computable
    outs, protos = model.apply(loaded, img)
    assert np.isfinite(np.asarray(protos)).all()


@pytest.mark.slow
def test_fastsam_matches_torch_twin():
    """Value-level parity vs an independent torch YOLOv8-seg twin whose
    state_dict uses ultralytics' exact FastSAM-x.pt naming: validates
    the converter layout AND our Flax forward math (same approach as
    the GroundingDINO HF parity check)."""
    pytest.importorskip("torch")
    from comat_tpu.tools import parity

    parity._RESULTS.clear()
    parity.check_fastsam()
    assert parity._RESULTS, "check_fastsam reported nothing"
    name, status, detail = parity._RESULTS[-1]
    assert name == "fastsam_torch_parity"
    assert status == "PASS", detail
