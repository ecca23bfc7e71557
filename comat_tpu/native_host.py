"""ctypes bindings for the native host runtime (native/comat_host.cpp).

Exposes:
  NativeLatentStore — drop-in for training.data.GanLatentStore with a
    C++ prefetch thread pool: `prefetch(prompts)` starts async reads for
    the NEXT batch while the device executes the current step;
    `gather()` blocks on completion.
  NativeCLIPTokenizer — C++ CLIP BPE, same __call__ contract as
    text.tokenizer.CLIPBPETokenizer (parity-tested in
    tests/test_native_host.py).

Falls back gracefully: `load_native()` returns None when the shared
library hasn't been built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libcomat_host.so",
)
_lib = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ch_store_open.restype = ctypes.c_void_p
    lib.ch_store_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int]
    lib.ch_store_num_prompts.argtypes = [ctypes.c_void_p]
    lib.ch_store_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ch_store_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ch_store_fetch.restype = ctypes.c_int64
    lib.ch_store_fetch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.ch_store_close.argtypes = [ctypes.c_void_p]
    lib.ch_bpe_load.restype = ctypes.c_void_p
    lib.ch_bpe_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ch_bpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ch_bpe_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeLatentStore:
    """Prefetching latent store (reference gan_dataset.py contract)."""

    def __init__(self, index_path: str, root: Optional[str] = None,
                 n_threads: int = 4, latent_elems: int = 64 * 64 * 4):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library not built (native/build.sh)")
        self.lib = lib
        root = root or os.path.dirname(os.path.abspath(index_path))
        self.h = lib.ch_store_open(
            index_path.encode(), root.encode(), n_threads
        )
        if not self.h:
            raise FileNotFoundError(index_path)
        self.latent_elems = latent_elems
        self._pending: Optional[np.ndarray] = None  # tickets

    def prefetch(self, prompts: Sequence[str]) -> None:
        n = len(prompts)
        idx = (ctypes.c_int * n)(
            *[self.lib.ch_store_lookup(self.h, p.encode()) for p in prompts]
        )
        for i in range(n):
            if idx[i] < 0:
                raise KeyError(prompts[i])
        tickets = (ctypes.c_int64 * n)()
        self.lib.ch_store_prefetch(self.h, idx, n, tickets)
        self._pending = tickets

    def gather(self, shape) -> np.ndarray:
        """Block on the prefetched batch; returns (n, *shape) float32."""
        assert self._pending is not None, "call prefetch() first"
        n = len(self._pending)
        elems = int(np.prod(shape))
        out = np.empty((n, elems), np.float32)
        for i, t in enumerate(self._pending):
            got = self.lib.ch_store_fetch(
                self.h, t,
                out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                elems,
            )
            if got != elems:
                raise IOError(f"latent {i}: got {got} want {elems}")
        self._pending = None
        return out.reshape((n,) + tuple(shape))

    def batch(self, prompts: Sequence[str]) -> np.ndarray:
        """Synchronous convenience matching GanLatentStore.batch; shape
        inferred as (s, s, 4) from latent_elems."""
        self.prefetch(prompts)
        s = int((self.latent_elems // 4) ** 0.5)
        return self.gather((s, s, 4))

    def close(self):
        if self.h:
            self.lib.ch_store_close(self.h)
            self.h = None


class NativeCLIPTokenizer:
    """C++ CLIP BPE with the python tokenizer's __call__ contract."""

    def __init__(self, vocab_path: str, merges_path: str):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library not built (native/build.sh)")
        self.lib = lib
        self.h = lib.ch_bpe_load(vocab_path.encode(), merges_path.encode())
        if not self.h:
            raise FileNotFoundError(vocab_path)
        self._vocab_path = vocab_path
        self._merges_path = merges_path
        self._py = None  # lazy python twin for token-string queries

    def encode_to_tokens(self, text: str):
        """Wordpiece strings incl. BOS/EOS (linguistics.get_indices
        consumes these for attrcon token alignment). The C++ encoder
        only exposes ids, so this delegates to a lazily-built python
        CLIPBPETokenizer over the same vocab/merges — it runs on a few
        prompts per batch on the host, off the hot path."""
        if self._py is None:
            from comat_tpu.text.tokenizer import CLIPBPETokenizer

            self._py = CLIPBPETokenizer(self._vocab_path, self._merges_path)
        return self._py.encode_to_tokens(text)

    def __call__(
        self, texts: Sequence[str], max_length: int = 77
    ) -> Dict[str, np.ndarray]:
        n = len(texts)
        arr = (ctypes.c_char_p * n)(*[t.encode() for t in texts])
        out = np.empty((n, max_length), np.int32)
        eos = np.empty((n,), np.int32)
        self.lib.ch_bpe_encode_batch(
            self.h, arr, n, max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            eos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return {"input_ids": out, "eos_positions": eos}
