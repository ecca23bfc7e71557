#!/bin/bash
# Fast test tier: everything not marked `slow` — the CI-style loop for
# quick iteration (~5 min warm on this 1-core host; the full suite's
# expensive e2e compiles are in `pytest -m slow`). Run the full suite
# before shipping: python -m pytest tests/ -x -q
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m "not slow" -x -q "$@"
