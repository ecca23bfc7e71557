"""Implementation-level numerical parity of our GroundingDetector vs
HF `transformers`' torch GroundingDino — the trusted port of the exact
detector the reference drives (attr_concen_utils/gsam_interface.py
loads groundingdino_swint_ogc; HF republishes those weights as
IDEA-Research/grounding-dino-tiny with renamed modules).

Random torch weights at matched tiny geometry flow through
gdino_import_hf (HF -> IDEA repack) + gdino_import (IDEA -> Flax), and
both models score the same image/text. No downloads: this validates
the forward math + both converter layers, leaving only the checkpoint
file itself unexercised (absent in zero-egress environments).

The comparison lives in comat_tpu.tools.parity.check_gdino (the
one-command harness runs it in its synthetic tier); this test drives it
and asserts the verdict.
"""

import pytest

pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip(
    "transformers.models.grounding_dino.modeling_grounding_dino"
)

pytestmark = pytest.mark.slow  # two full detector builds + compiles


def test_gdino_matches_transformers():
    from comat_tpu.tools import parity

    parity._RESULTS.clear()
    parity.check_gdino()
    assert parity._RESULTS, "check_gdino reported nothing"
    name, status, detail = parity._RESULTS[-1]
    assert name == "gdino_torch_parity"
    assert status == "PASS", detail
