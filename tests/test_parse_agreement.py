"""miniparse grounded against MANUAL UD annotations (VERDICT r4 #9).

data/parse_cache_manual_200.jsonl holds hand-reviewed dependency parses
for 200 deterministically sampled corpus prompts (100 abc5k / 60 hrs10k
/ 40 t2icomp), annotated to en_core_web_trf conventions (ClearNLP
labels, first-conjunct coordination, UPOS). Provenance: miniparse
drafts reviewed token-by-token and corrected — 183 of 200 draft parses
required fixes, so the reference is NOT a miniparse echo. The recorded
agreement (data/parse_agreement_manual_200.json) replaces the former
self-referential "unmeasured" claim: miniparse extracts the same
attrcon groups as a UD-correct parse for ~68% of prompts exactly, with
group precision ~0.86 / recall ~0.81.

These tests re-measure agreement in CI (so a miniparse change shows up
as a delta against the checked-in reference) and pin the recorded
numbers to the measurement.
"""

import json
import os

from comat_tpu.text.tokenizer import HashTokenizer
from comat_tpu.tools.parse_stats import agreement, read_corpus
from comat_tpu.text.parse_cache import load_parse_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "data", "parse_sample_200.txt")
CACHE = os.path.join(REPO, "data", "parse_cache_manual_200.jsonl")
RECORD = os.path.join(REPO, "data", "parse_agreement_manual_200.json")


def test_manual_cache_well_formed():
    cache = load_parse_cache(CACHE)
    prompts = read_corpus(CORPUS)
    assert len(cache) == 200
    assert all(p in cache for p in prompts)
    for rec in cache.values():
        assert rec["parser"] == "manual_ud_r5"
        toks = rec["tokens"]
        roots = [i for i, t in enumerate(toks) if t["h"] == i]
        assert len(roots) == 1, rec["prompt"]
        assert all(0 <= t["h"] < len(toks) for t in toks)


def test_agreement_matches_recorded_numbers():
    prompts = read_corpus(CORPUS)
    cache = load_parse_cache(CACHE)
    got = agreement(prompts, cache, HashTokenizer(49408))
    with open(RECORD) as f:
        want = json.load(f)
    for k in ("exact_match_rate", "group_precision", "group_recall",
              "mean_jaccard"):
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
    # floor: a miniparse regression below the measured level fails CI
    assert got["group_precision"] >= 0.80
    assert got["group_recall"] >= 0.75
