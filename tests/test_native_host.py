"""Native host runtime tests: C++ latent prefetcher + BPE parity with
the python tokenizer (builds the library if missing)."""

import json
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    lib_path = os.path.join(REPO, "native", "libcomat_host.so")
    if not os.path.exists(lib_path):
        subprocess.check_call(["bash", os.path.join(REPO, "native", "build.sh")])
    from comat_tpu.native_host import load_native

    lib = load_native()
    assert lib is not None
    return lib


def test_native_latent_store(tmp_path, native_lib):
    from comat_tpu.native_host import NativeLatentStore

    lat_dir = tmp_path / "latents"
    lat_dir.mkdir()
    rng = np.random.RandomState(0)
    index = tmp_path / "index.jsonl"
    blobs = {}
    with open(index, "w") as f:
        for i in range(5):
            arr = rng.randn(8, 8, 4).astype(np.float32)
            name = f"latents/l{i}.npy"
            np.save(tmp_path / name, arr)
            prompt = f"prompt number {i}"
            blobs[prompt] = arr
            f.write(json.dumps({"prompt": prompt, "file_path": name}) + "\n")
            # second latent for prompt 0 (multi-latent prompts)
            if i == 0:
                np.save(tmp_path / "latents/l0b.npy", arr + 1)
                f.write(json.dumps(
                    {"prompt": prompt, "file_path": "latents/l0b.npy"}
                ) + "\n")

    store = NativeLatentStore(str(index), str(tmp_path),
                              latent_elems=8 * 8 * 4)
    prompts = ["prompt number 1", "prompt number 3"]
    store.prefetch(prompts)
    out = store.gather((8, 8, 4))
    np.testing.assert_allclose(out[0], blobs[prompts[0]])
    np.testing.assert_allclose(out[1], blobs[prompts[1]])
    # multi-latent prompt returns one of its variants
    got = store.batch(["prompt number 0"])[0]
    d0 = np.abs(got - blobs["prompt number 0"]).max()
    d1 = np.abs(got - (blobs["prompt number 0"] + 1)).max()
    assert min(d0, d1) < 1e-6
    with pytest.raises(KeyError):
        store.prefetch(["nonexistent"])
    store.close()


def test_native_bpe_parity(tmp_path, native_lib):
    """C++ BPE must match the python CLIPBPETokenizer on a synthetic
    vocab exercising merges, byte mapping, and padding."""
    from comat_tpu.native_host import NativeCLIPTokenizer
    from comat_tpu.text.tokenizer import CLIPBPETokenizer, bytes_to_unicode

    # synthetic vocab: single chars + a few merges + specials
    be = bytes_to_unicode()
    chars = [be[ord(c)] for c in "abcdehlorstuw "]
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = ["h e", "l l", "o</w> o</w>", "he ll", "r e", "c a", "ca t</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["hell"] = vocab.get("hell", len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    with open(vpath, "w") as f:
        json.dump(vocab, f)
    with open(mpath, "w") as f:
        f.write("#version\n" + "\n".join(merges) + "\n")

    py = CLIPBPETokenizer(str(vpath), str(mpath))
    cc = NativeCLIPTokenizer(str(vpath), str(mpath))

    texts = ["hello cat", "a cat sat", "HELLO", "cat cat cat", ""]
    got = cc(texts, max_length=16)
    want_rows = []
    for t in texts:
        enc = py.encode(t)
        # drop tokens not in the tiny vocab the same way C++ does
        want_rows.append(enc)
    py_batch = py(texts, max_length=16)
    np.testing.assert_array_equal(got["input_ids"], py_batch["input_ids"])
    np.testing.assert_array_equal(
        got["eos_positions"], py_batch["eos_positions"]
    )


def test_bert_wordpiece_tokenizer(tmp_path):
    from comat_tpu.text.tokenizer import BertWordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "photograph",
             "##y", "of", "cat", "##s", "red"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = BertWordPieceTokenizer(str(vp))
    out = tok(["a photography of red cats", "a cat"])
    ids, mask = out["input_ids"], out["attention_mask"]
    # photography -> photograph ##y ; cats -> cat ##s
    row = [vocab[i] for i in ids[0][mask[0] == 1]]
    assert row == ["[CLS]", "a", "photograph", "##y", "of", "red", "cat",
                   "##s", "[SEP]"]
    assert mask[1].sum() == 4  # [CLS] a cat [SEP]
    # unknown word -> [UNK]
    out2 = tok(["zzz"])
    assert out2["input_ids"][0][1] == 1


def test_native_tokenizer_encode_to_tokens(tmp_path, native_lib):
    """The native wrapper must serve linguistics.get_indices'
    token-string queries (attrcon alignment) like the python BPE."""
    import json as _json

    from comat_tpu.native_host import NativeCLIPTokenizer
    from comat_tpu.text.tokenizer import CLIPBPETokenizer, bytes_to_unicode

    be = bytes_to_unicode()
    vocab = {}
    for c in [be[ord(ch)] for ch in "acehlorst "]:
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vpath.write_text(_json.dumps(vocab))
    mpath.write_text("#version\n")

    py = CLIPBPETokenizer(str(vpath), str(mpath))
    cc = NativeCLIPTokenizer(str(vpath), str(mpath))
    for t in ["a cat", "horse", ""]:
        assert cc.encode_to_tokens(t) == py.encode_to_tokens(t)
