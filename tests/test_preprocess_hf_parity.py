"""BLIP image-preprocess parity vs the reference's torch transform.

The reference scores rewards on Resize(384, BICUBIC, antialias=True) +
CLIP-stat Normalize (concept_mat_utils/caption_blip.py:33-36). Our
blip_preprocess rides jax.image.resize — pin that it matches torch's
antialiased bicubic (which torchvision Resize lowers to) at the
training shapes, including the post-crop-jitter 510 input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from comat_tpu.losses.caption_reward import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    blip_preprocess,
)


@pytest.mark.parametrize("hin", [512, 510, 256])
def test_blip_preprocess_matches_torch(hin):
    rng = np.random.default_rng(0)
    x = rng.random((2, hin, hin, 3)).astype(np.float32)

    ours = np.asarray(blip_preprocess(x))

    t = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(384, 384),
        mode="bicubic", antialias=True,
    )
    mean = torch.tensor(CLIP_IMAGE_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_IMAGE_STD).view(1, 3, 1, 1)
    want = ((t - mean) / std).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, want, atol=2e-4)
