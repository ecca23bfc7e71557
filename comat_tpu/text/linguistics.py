"""Prompt linguistics: attribute–noun group mining + tokenizer alignment.

Reference: attribute_concen_utils.py — spacy dependency-tree mining of
noun+modifier subtrees (extract_attribution_indices :39, amod/acomp/
nmod/npadvmod patterns) and CLIP wordpiece alignment
(align_wordpieces_indices :11, get_indices :134).

spacy's transformer parser is not in this image, so extraction is
two-tier:
  1. spacy dependency parse when importable (same modifier-dep patterns
     as the reference);
  2. a chunking heuristic otherwise: split on conjunctions/punctuation,
     last content word of a chunk is the noun, preceding content words
     are its attributes — which matches the structure of the attribute-
     binding corpora the reference trains on (abc5k: "a red car and a
     blue bird").

Either way the output contract is the same: per prompt, a list of
(attribute_words, noun_word) groups plus their CLIP token indices
(1-based — position 0 is BOS), the exact coordinate system the
grounding loss consumes (attn maps are (HW, 77) over CLIP positions).
All of this is host-side preprocessing, outside the jit boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

STOPWORDS = {
    "a", "an", "the", "of", "and", "with", "on", "in", "at", "by", "to",
    "is", "are", "was", "were", "next", "near", "under", "over", "above",
    "below", "beside", "behind", "there", "some", "its", "his", "her",
    "their", "that", "this", "these", "those",
}

# Nouns the reference refuses to ground (gsam_interface.py:247-251) —
# background/scene words that segment poorly.
INVALID_NOUNS = {
    "scene", "surface", "area", "atmosphere", "noise", "place", "kitchen",
    "dream", "interior", "exterior", "meal", "background", "bathroom",
    "room", "scent", "street", "hillside", "mountain", "sky", "sea",
    "ocean", "lost", "language", "skill", "one", "night", "day",
    "morning", "space", "environment", "conditions", "field", "shore",
    "restroom", "party", "grass", "snow", "meadow", "water", "shadow",
    "waves", "song", "cycle", "sunlight", "mysteries", "wall", "salon",
    "range", "cry", "speech", "tone", "thing", "about", "activity",
    "air", "advertisement", "airport", "also",
}

_CONJ = {"and", "or", ",", ".", ";", "with", "beside", "near", "next",
         "on", "in", "under", "over", "behind", "above", "below", "at"}


@dataclasses.dataclass
class AttributeGroup:
    attribute_words: List[str]
    noun: str
    # CLIP token indices (1-based, BOS at 0): attributes+noun combined
    # (the reference folds noun tokens into the attribute group —
    # gsam_interface.py:176-184)
    token_indices: List[int]


_NLP = None
_NLP_TRIED = False


def _get_spacy():
    global _NLP, _NLP_TRIED
    if _NLP_TRIED:
        return _NLP
    _NLP_TRIED = True
    try:
        import spacy

        for model in ("en_core_web_trf", "en_core_web_sm"):
            try:
                _NLP = spacy.load(model)
                break
            except Exception:
                continue
    except Exception:
        _NLP = None
    return _NLP


def _spacy_groups(prompt: str) -> Optional[List[Tuple[List[str], str]]]:
    nlp = _get_spacy()
    if nlp is None:
        return None
    doc = nlp(prompt)
    groups = []
    modifiers = {"amod", "nmod", "compound", "npadvmod", "acomp", "nummod"}
    for tok in doc:
        if tok.pos_ not in ("NOUN", "PROPN"):
            continue
        attrs = [c.text for c in tok.children if c.dep_ in modifiers]
        groups.append((attrs, tok.text))
    return groups


def _heuristic_groups(prompt: str) -> List[Tuple[List[str], str]]:
    words = [
        w.strip(".,;:!?\"'()").lower() for w in prompt.split()
    ]
    words = [w for w in words if w]
    chunks: List[List[str]] = [[]]
    for w in words:
        if w in _CONJ:
            if chunks[-1]:
                chunks.append([])
            continue
        chunks[-1].append(w)
    groups = []
    for chunk in chunks:
        content = [w for w in chunk if w not in STOPWORDS]
        if not content:
            continue
        noun = content[-1]
        attrs = content[:-1]
        groups.append((attrs, noun))
    return groups


def word_to_clip_token_indices(
    prompt: str, tokenizer, max_length: int = 77
) -> Dict[str, List[List[int]]]:
    """Map each whitespace word of `prompt` to its CLIP token positions
    (1-based). Duplicate words map to each occurrence in order
    (reference align_wordpieces_indices semantics)."""
    out: Dict[str, List[List[int]]] = {}
    pos = 1  # skip BOS
    for w in prompt.split():
        clean = w.strip(".,;:!?\"'()").lower()
        toks = tokenizer.tokenize(clean) if clean else []
        # punctuation stripped from the word still occupies tokens in
        # the real encoding; re-tokenize the raw word for positioning
        raw_toks = tokenizer.tokenize(w.lower())
        n = len(raw_toks)
        if clean and n:
            idxs = [pos + j for j in range(min(len(toks), n))]
            if max(idxs, default=0) < max_length - 1:
                out.setdefault(clean, []).append(idxs)
        pos += n
    return out


def extract_attribute_groups(
    prompt: str, tokenizer, max_length: int = 77
) -> List[AttributeGroup]:
    """Full pipeline: groups + dedup/blacklist filtering
    (gsam_interface.py:232-261) + CLIP token alignment."""
    raw = _spacy_groups(prompt)
    if raw is None:
        raw = _heuristic_groups(prompt)

    # duplicate-noun removal: a noun that appears in >1 group is
    # dropped entirely (reference :234-243)
    noun_counts: Dict[str, int] = {}
    for _, noun in raw:
        noun_counts[noun] = noun_counts.get(noun, 0) + 1
    word_map = word_to_clip_token_indices(prompt, tokenizer, max_length)
    used: Dict[str, int] = {}

    groups: List[AttributeGroup] = []
    for attrs, noun in raw:
        if noun_counts[noun] > 1:
            continue
        if noun in INVALID_NOUNS or noun[:-1] in INVALID_NOUNS:
            continue
        token_indices: List[int] = []
        ok = True
        for w in attrs + [noun]:
            occs = word_map.get(w)
            if not occs:
                ok = False
                break
            k = used.get(w, 0)
            token_indices.extend(occs[min(k, len(occs) - 1)])
            used[w] = k + 1
        if ok and token_indices:
            groups.append(AttributeGroup(attrs, noun, token_indices))
    return groups


def pad_groups(
    all_groups: Sequence[List[AttributeGroup]],
    max_words: int = 8,
    max_tokens: int = 8,
) -> Dict[str, np.ndarray]:
    """Batch the ragged groups into fixed-shape arrays for the jitted
    grounding loss:
      token_idx  (B, W, T) int32 — CLIP positions, 0-padded
      token_valid(B, W, T) bool
      word_valid (B, W)    bool
    plus the noun strings per sample (host-side, for the segmenter).
    """
    B = len(all_groups)
    token_idx = np.zeros((B, max_words, max_tokens), np.int32)
    token_valid = np.zeros((B, max_words, max_tokens), bool)
    word_valid = np.zeros((B, max_words), bool)
    nouns: List[List[str]] = []
    for b, groups in enumerate(all_groups):
        nouns.append([g.noun for g in groups[:max_words]])
        for w, g in enumerate(groups[:max_words]):
            ts = g.token_indices[:max_tokens]
            token_idx[b, w, : len(ts)] = ts
            token_valid[b, w, : len(ts)] = True
            word_valid[b, w] = len(ts) > 0
    return {
        "token_idx": token_idx,
        "token_valid": token_valid,
        "word_valid": word_valid,
        "nouns": nouns,
    }
