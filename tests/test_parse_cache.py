"""Parse-cache contract (VERDICT r2 missing #3): jsonl round-trip,
parse_prompt consuming cached parses verbatim, and the agreement /
stats tools of tools/parse_stats."""

import json

from comat_tpu.text import linguistics, miniparse, parse_cache
from comat_tpu.text.tokenizer import HashTokenizer
from comat_tpu.tools import parse_stats

PROMPTS = [
    "a red car and a blue bird",
    "two green cats on a mat",
    "A brown and white horse standing in front of a red silo.",
    "The cozy blanket draped over the bumpy pillow.",
]


def _tok():
    return HashTokenizer(49408)


def test_roundtrip_identical_docs_and_groups(tmp_path):
    path = str(tmp_path / "cache.jsonl")
    n = parse_cache.dump_parse_cache(
        path, PROMPTS, "miniparse", miniparse.parse
    )
    assert n == len(PROMPTS)
    cache = parse_cache.load_parse_cache(path)
    tok = _tok()
    for p in PROMPTS:
        orig = miniparse.parse(p)
        rebuilt = parse_cache.doc_from_record(cache[p])
        assert [(t.text, t.pos_, t.dep_) for t in orig] == [
            (t.text, t.pos_, t.dep_) for t in rebuilt
        ]
        # head/children structure: same head index per token
        assert [
            (t.head.i if t.head is not None else None) for t in orig
        ] == [
            (t.head.i if t.head is not None else None) for t in rebuilt
        ]
        g1 = linguistics.extract_attribute_groups(p, tok, doc=orig)
        g2 = linguistics.extract_attribute_groups(p, tok, doc=rebuilt)
        assert [parse_stats.group_key(g) for g in g1] == [
            parse_stats.group_key(g) for g in g2
        ]


def test_parse_prompt_consumes_armed_cache_verbatim():
    """A cache whose parse DIFFERS from miniparse must win: tag 'red'
    as a NOUN with no amod edge — the cached parse then yields no
    attribute groups where miniparse yields one."""
    prompt = "a red car"
    tok = _tok()
    assert linguistics.extract_attribute_groups(prompt, tok), (
        "miniparse should find [red car] — test premise"
    )
    rec = {
        "tokens": [
            {"t": "a", "p": "DET", "d": "det", "h": 1},
            {"t": "red", "p": "NOUN", "d": "ROOT", "h": 1},
            {"t": "car", "p": "NOUN", "d": "dep", "h": 2},
        ]
    }
    parse_cache.set_parse_cache({prompt: rec})
    try:
        doc = linguistics.parse_prompt(prompt)
        assert [t.pos_ for t in doc] == ["DET", "NOUN", "NOUN"]
        assert not linguistics.extract_attribute_groups(prompt, tok)
        # un-cached prompts still parse normally
        assert linguistics.extract_attribute_groups(
            "a blue bird", tok
        )
    finally:
        parse_cache.set_parse_cache(None)
    assert linguistics.extract_attribute_groups(prompt, tok)


def test_agreement_self_cache_is_perfect(tmp_path):
    path = str(tmp_path / "cache.jsonl")
    parse_cache.dump_parse_cache(
        path, PROMPTS, "miniparse", miniparse.parse
    )
    rec = parse_stats.agreement(
        PROMPTS, parse_cache.load_parse_cache(path), _tok()
    )
    assert rec["prompts_in_cache"] == len(PROMPTS)
    assert rec["exact_match_rate"] == 1.0
    assert rec["group_precision"] == 1.0
    assert rec["group_recall"] == 1.0
    assert rec["mean_jaccard"] == 1.0


def test_agreement_detects_divergence(tmp_path):
    """A cache that disagrees on one prompt must lower exact-match and
    report the disagreement."""
    path = str(tmp_path / "cache.jsonl")
    parse_cache.dump_parse_cache(
        path, PROMPTS, "miniparse", miniparse.parse
    )
    cache = parse_cache.load_parse_cache(path)
    # corrupt the first prompt's parse: all NOUN, no edges
    p0 = PROMPTS[0]
    cache[p0] = {
        "tokens": [
            {"t": t["t"], "p": "NOUN", "d": "ROOT", "h": i}
            for i, t in enumerate(cache[p0]["tokens"])
        ],
        "parser": "corrupt",
    }
    rec = parse_stats.agreement(PROMPTS, cache, _tok())
    assert rec["exact_match_rate"] < 1.0
    assert rec["disagreement_examples"]
    assert rec["disagreement_examples"][0]["prompt"] == p0


def test_stats_and_cli(tmp_path, capsys):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(PROMPTS) + "\n")
    out = tmp_path / "stats.json"
    assert parse_stats.main([
        "stats", "--corpus", str(corpus), "--out", str(out),
    ]) == 0
    rec = json.loads(out.read_text())
    assert rec["prompts"] == len(PROMPTS)
    assert rec["total_groups"] >= 1
    assert 0.0 <= rec["group_yield"] <= 1.0
    capsys.readouterr()

    # export -> agree CLI round trip
    cachef = tmp_path / "parses.jsonl"
    assert parse_stats.main([
        "export", "--corpus", str(corpus), "--out", str(cachef),
    ]) == 0
    capsys.readouterr()
    agreef = tmp_path / "agree.json"
    assert parse_stats.main([
        "agree", "--corpus", str(corpus), "--cache", str(cachef),
        "--out", str(agreef),
    ]) == 0
    rec = json.loads(agreef.read_text())
    assert rec["exact_match_rate"] == 1.0
    assert rec["cache_parser"] == "miniparse"
