#!/bin/bash
# Release test tier (VERDICT r3 weak #3): the NORTH-STAR checks that
# must provably run before a round ends, regardless of the fast tier's
# `slow` markers:
#
#   - step-loss + gradient parity vs the independent torch twin
#     (BASELINE.json: SD1.5 CoMat step-loss parity <= 1e-3)
#   - attrcon e2e (cached-capture == fallback; presample split)
#   - SDXL e2e
#   - multi-device gsam presample path (image-dependent segmenter on
#     the 8-device mesh)
#   - synthetic-snapshot loader tiers (parity CLI + trainer glue)
#   - TRUE multi-process training (2 procs x 4 CPU devices over gloo)
#   - miniparse agreement vs the manual UD parse cache
#
# The real-geometry twin fixture (true SD1.5 channel widths, fp32,
# ~30-60 min single-core) runs separately:
#   python -m comat_tpu.tools.step_loss_fixture --real
#
# ~15-25 min warm on the 1-core host (persistent jax compile cache).
# Writes a timestamped log under data/release_logs/ so the run is
# auditable from the repo itself.
set -e
cd "$(dirname "$0")/.."
mkdir -p data/release_logs
LOG="data/release_logs/release_$(date -u +%Y%m%dT%H%M%SZ).log"
echo "release tier -> $LOG"
python -m pytest \
    tests/test_step_loss_fixture.py \
    tests/test_attrcon_e2e.py \
    tests/test_sdxl_e2e.py \
    tests/test_multichip_gsam.py \
    tests/test_synthetic_snapshots.py \
    tests/test_multiprocess_train.py \
    tests/test_parse_agreement.py \
    -q "$@" 2>&1 | tee "$LOG"
