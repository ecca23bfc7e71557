"""Tokenizer parity vs HF `transformers` on the same vocab files.

The reference feeds prompts through HF CLIPTokenizer (via diffusers
pipelines) and BertTokenizer (via BlipProcessor). Our self-contained
implementations (text/tokenizer.py, plus the C++ NativeCLIPTokenizer)
load the same vocab.json/merges.txt/vocab.txt formats — id-level
divergence would silently corrupt every real-weight run, so pin
equality against the HF slow tokenizers on synthetic-but-real vocab
files (no downloads).
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from comat_tpu.text.tokenizer import (
    BertWordPieceTokenizer,
    CLIPBPETokenizer,
    bytes_to_unicode,
)

PROMPTS = [
    "a red car and a blue bird",
    "the cat, the hat!",
    "it's a bear's den...",
    "one1 two2 3three   44",
    "A Red CAR?!",
    "bluebird birdcar carred",
    "an   odd    spacing\tcase",
    "hyphen-ated and (parens) [brackets]",
    "trailing space ",
    " leading",
    "",
    "a photography of a red car and a blue bird.",
]


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipvocab")
    base = list(bytes_to_unicode().values())
    merges = [
        ("t", "h"), ("th", "e</w>"), ("r", "e"), ("re", "d</w>"),
        ("c", "a"), ("ca", "r</w>"), ("b", "l"), ("bl", "u"),
        ("blu", "e</w>"), ("b", "i"), ("bi", "r"), ("bir", "d</w>"),
        ("a", "n"), ("an", "d</w>"), ("th", "e"), ("a", "t</w>"),
        ("h", "at</w>"), ("c", "at</w>"), ("i", "n"), ("in", "g</w>"),
        ("o", "n"), ("e", "d</w>"), ("ca", "r"), ("re", "d"),
        ("s</w>", ""),  # replaced below: merges must be pairs of symbols
    ]
    merges = merges[:-1]
    merge_toks = ["".join(m) for m in merges]
    vocab = (
        base
        + [b + "</w>" for b in base]
        + merge_toks
        + ["<|startoftext|>", "<|endoftext|>"]
    )
    vpath, mpath = d / "vocab.json", d / "merges.txt"
    vpath.write_text(
        json.dumps({t: i for i, t in enumerate(vocab)}), encoding="utf-8"
    )
    mpath.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8",
    )
    return str(vpath), str(mpath)


def test_clip_bpe_matches_hf(clip_files):
    vpath, mpath = clip_files
    hf = transformers.CLIPTokenizer(vpath, mpath)
    ours = CLIPBPETokenizer(vpath, mpath)
    for text in PROMPTS:
        want = hf(text, add_special_tokens=True)["input_ids"]
        got = ours.encode(text)
        assert got == want, (text, got, want)


def test_clip_call_contract_matches_hf(clip_files):
    """__call__ truncation/padding/eos_positions vs HF's
    model_max_length semantics (padding='max_length', truncation)."""
    vpath, mpath = clip_files
    hf = transformers.CLIPTokenizer(vpath, mpath, model_max_length=8)
    ours = CLIPBPETokenizer(vpath, mpath)
    enc = ours(PROMPTS, max_length=8)
    want = hf(
        PROMPTS, padding="max_length", truncation=True, max_length=8
    )["input_ids"]
    np.testing.assert_array_equal(enc["input_ids"], np.asarray(want))
    # eos_positions = first EOS slot (the pooling index for CLIP)
    for row, pos in zip(want, enc["eos_positions"]):
        assert row[pos] == hf.eos_token_id


def test_native_clip_matches_hf(clip_files):
    vpath, mpath = clip_files
    native_host = pytest.importorskip("comat_tpu.native_host")
    if native_host.load_native() is None:
        pytest.skip("native library not built")
    cc = native_host.NativeCLIPTokenizer(vpath, mpath)
    enc = cc(PROMPTS, max_length=16)
    want = transformers.CLIPTokenizer(
        vpath, mpath, model_max_length=16
    )(PROMPTS, padding="max_length", truncation=True, max_length=16)[
        "input_ids"
    ]
    np.testing.assert_array_equal(enc["input_ids"], np.asarray(want))


@pytest.fixture(scope="module")
def bert_vocab(tmp_path_factory):
    d = tmp_path_factory.mktemp("bertvocab")
    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "a", "an", "and", "the", "of", "red", "blue", "car", "bird",
        "cat", "hat", "photography", "it", "'", "s", ",", ".", "!", "?",
        "(", ")", "[", "]", "-",
        "##s", "##'", "##ing", "##ed", "##1", "##2",
        "one", "two", "three", "bear", "den", "##bird", "blue",
        "hyphen", "##ated", "paren", "##s", "bracket", "space",
        "lead", "##ing", "trail", "odd", "spacing", "case", "44", "3",
        "1", "2",
    ]
    # dedup preserving order (BertTokenizer maps dup lines to last id;
    # keep the file duplicate-free so both sides agree)
    seen, uniq = set(), []
    for w in words:
        if w not in seen:
            seen.add(w)
            uniq.append(w)
    p = d / "vocab.txt"
    p.write_text("\n".join(uniq) + "\n", encoding="utf-8")
    return str(p)


def test_bert_wordpiece_matches_hf(bert_vocab):
    hf = transformers.BertTokenizer(bert_vocab, do_lower_case=True)
    ours = BertWordPieceTokenizer(bert_vocab)
    for text in PROMPTS:
        want = hf(text, add_special_tokens=True)["input_ids"]
        got = (
            [ours.cls_token_id] + ours.tokenize(text) + [ours.sep_token_id]
        )
        assert got == want, (text, got, want)
