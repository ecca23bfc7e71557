"""Multi-device coverage of the image-DEPENDENT segmentation path
(VERDICT r3 missing #4).

The published recipe (`--seg_model gsam`, scripts/sd15.sh) routes every
step through: presample program (no-grad pass-1 sampling + VAE decode)
→ `_local_rows` host reconstruction of the batch-sharded image →
host-side Grounded-SAM → grad program with `seg_masks` + replay tables
(reference flow being replaced: attr_concen_utils/gsam_interface.py:54-137,
where each DDP rank segments its local generated images).

Everything before this file tested that sequence only single-program or
with image-INdependent segmenters (no presample program at all). Here:

  - `_local_rows` unit tests: global-order reconstruction and
    model-axis-replica dedup on a 4x2 ('data','model') mesh
    (training/trainer.py:48-57);
  - an end-to-end trainer step on the 8-device CPU mesh with an
    image-dependent segmenter: presample runs, the host segmenter sees
    exactly the deduped global batch, its image-derived masks feed the
    grad program, and the step's grounding losses are finite.
"""

import json
import os

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from comat_tpu.parallel.mesh import make_mesh, shard_batch
from comat_tpu.training.trainer import _local_rows


def _global(x, mesh):
    return shard_batch({"x": x}, mesh)["x"]


def test_local_rows_global_order_dp_only():
    mesh = make_mesh(data=8, model=1)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = _global(x, mesh)
    assert len(g.addressable_shards) == 8
    np.testing.assert_array_equal(_local_rows(g), x)


def test_local_rows_dedups_model_axis_replicas():
    """On a ('data','model') = (4,2) mesh every data shard exists twice
    (one replica per model column); _local_rows must return each row
    ONCE, in global order — duplicated rows would double-segment and
    misalign masks with batch rows."""
    mesh = make_mesh(data=4, model=2)
    x = np.arange(8 * 2 * 2, dtype=np.float32).reshape(8, 2, 2)
    g = _global(x, mesh)
    # 8 addressable shards on the single host: 4 data blocks x 2 replicas
    assert len(g.addressable_shards) == 8
    starts = sorted(s.index[0].start or 0 for s in g.addressable_shards)
    assert starts == [0, 0, 2, 2, 4, 4, 6, 6]
    np.testing.assert_array_equal(_local_rows(g), x)


def test_local_rows_shard_enumeration_order_independent():
    """Global order must come from shard INDICES, not the order
    addressable_shards happens to enumerate devices in — build the mesh
    on a reversed device list so enumeration order disagrees with row
    order."""
    mesh = make_mesh(data=4, model=2, devices=list(reversed(jax.devices())))
    x = np.arange(4 * 5, dtype=np.float32).reshape(4, 5)
    np.testing.assert_array_equal(_local_rows(_global(x, mesh)), x)


def test_local_rows_replicated_array_passthrough():
    mesh = make_mesh(data=4, model=2)
    x = np.arange(6 * 2, dtype=np.float32).reshape(6, 2)
    g = jax.device_put(x, NamedSharding(mesh, P()))
    np.testing.assert_array_equal(_local_rows(g), x)


class ImageDependentStubSegmenter:
    """Image-dependent stand-in with GroundedSAM's protocol surface
    (`image_dependent = True`, `__call__(image01, nouns) -> [H,W]
    masks`): masks are thresholded red-channel pixels, so they are a
    pure function of the GENERATED image — mask content entering the
    loss proves the presample image actually reached the segmenter."""

    image_dependent = True

    def __init__(self):
        self.seen_images = []
        self.seen_nouns = []

    def __call__(self, image01, nouns):
        self.seen_images.append(np.asarray(image01).copy())
        self.seen_nouns.append(list(nouns))
        # CONTIGUOUS top band, height from the image's mean red
        # intensity (bounded to [H/4, H/2]): scattered masks binarize
        # to all-ones under the loss's antialiased resize-then->0 at
        # tiny capture resolutions (grounding._resize_masks) and zero
        # the token loss; a band keeps both in- and out-of-mask pixels
        # at every capture layer, so the asserted losses are strictly
        # in (0, saturation) through this path.
        H, W, _ = image01.shape
        r = int(np.clip(round(H * float(image01[..., 0].mean())),
                        H // 4, H // 2))
        m = np.zeros((H, W), np.float32)
        m[:r] = 1.0
        return [m for _ in nouns]


@pytest.mark.slow
def test_trainer_presample_gsam_path_multichip(tmp_path, monkeypatch):
    """Full trainer step on the 8-device mesh (DPxTP 4x2) with an
    image-dependent segmenter: the presample->host-segment->grad-program
    sequence of the published `--seg_model gsam` recipe
    (training/trainer.py train loop; reference
    attr_concen_utils/gsam_interface.py:54-137)."""
    import comat_tpu.segmentation.interface as seg_iface
    from comat_tpu.training.arguments import parse_args
    from comat_tpu.training.trainer import Trainer

    stub = ImageDependentStubSegmenter()
    # the tiny-models branch instantiates CenterPriorSegmenter();
    # substitute the image-dependent stub through the same seam
    monkeypatch.setattr(
        seg_iface, "CenterPriorSegmenter", lambda: stub
    )

    # distinct prompts per row (distinct generated images) whose
    # miniparse groups all yield the SAME nouns: a trailing "... number
    # {i}" would reparse "bird number" with head noun "number"
    colors = ["blue", "green", "yellow", "purple",
              "orange", "black", "white", "pink"]
    prompts = tmp_path / "prompts.txt"
    prompts.write_text(
        "\n".join(
            f"a red car and a {c} bird" for c in colors
        )
        + "\n"
    )
    args = parse_args([
        "--training_prompts", str(prompts),
        "--output_dir", str(tmp_path / "out"),
        "--pretrain_model_name", "sd_1_5_attrcon",
        "--tiny_models",
        "--train_batch_size", "1",      # per-chip -> global B = 4
        "--mesh_model_axis", "2",       # ('data','model') = (4, 2)
        "--seed", "0",
        "--total_step", "4",
        "--K", "2",
        "--attrcon_train_steps", "1",
        "--resolution", "64",
        "--max_train_steps", "1",
        "--validation_steps", "0",
    ])
    t = Trainer(args)
    # image-dependent segmenter selected -> split presample program
    assert t.seg_holder is not None and t.seg_holder.image_dependent
    assert t.presample_step is not None
    assert t.seg_holder.segmenter is stub
    assert dict(zip(t.mesh.axis_names, t.mesh.devices.shape)) == {
        "data": 4, "model": 2,
    }

    t.train()

    # ---- the host segmenter saw the deduped global batch ----
    # B_global = train_batch_size * data_axis = 4; ONE call per row per
    # step (model-axis replicas deduped by _local_rows), for exactly
    # max_train_steps steps
    assert len(stub.seen_images) == 4, len(stub.seen_images)
    for img in stub.seen_images:
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        assert 0.0 <= img.min() and img.max() <= 1.0
    # nouns armed from THIS batch's prompts ("car", "bird" from the
    # miniparse groups)
    flat_nouns = {n for ns in stub.seen_nouns for n in ns}
    assert "car" in flat_nouns and "bird" in flat_nouns, flat_nouns
    # rows are distinct prompts -> distinct generated images (a
    # replica-duplicated batch would repeat rows)
    flat = [i.ravel() for i in stub.seen_images]
    for a in range(len(flat)):
        for b in range(a + 1, len(flat)):
            assert not np.allclose(flat[a], flat[b]), (a, b)

    # ---- the step consumed the masks: grounding losses finite ----
    with open(tmp_path / "out" / "metrics.jsonl") as f:
        recs = [json.loads(line) for line in f if line.strip()]
    step_recs = [r for r in recs if "token_loss" in r]
    assert step_recs, recs
    for r in step_recs:
        # NONZERO grounding losses: the image-derived masks reached the
        # loss (all-ones masks zero the token loss; all-zero masks
        # saturate it at 1/word — the median-threshold stub sits
        # strictly between)
        assert np.isfinite(r["step_loss"]), r
        assert 0.0 < r["token_loss"], r
        assert 0.0 < r["pixel_loss"], r
