"""ctypes bindings for the C++ ingestion fast path (``native/thr_native.cpp``).

Loads ``native/libthr_native.so`` when present (``make -C native``), exposing:

- :class:`NativeAnalyzer` — tokenizer/vocabulary drop-in matching
  ``analyzer.Analyzer`` + ``analyzer.Vocabulary`` semantics (parity-tested),
- :func:`native_postings` — CSR + term-table assembly matching the Python loops in
  ``index/bm25_index.py``.

Everything degrades gracefully: :func:`available` is False when the library is missing
or fails to load, and callers fall back to the pure-Python path. The query path is
unaffected either way — this accelerates ingestion only.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .analyzer import Analyzer
from .config import RAGConfig, get_settings

_LIB_PATHS = [
    Path(__file__).resolve().parent.parent / "native" / "libthr_native.so",
    Path(__file__).resolve().parent / "libthr_native.so",
]

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    path = next((p for p in _LIB_PATHS if p.exists()), None)
    if path is None:
        _load_error = "libthr_native.so not built (run: make -C native)"
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError as e:  # pragma: no cover
        _load_error = str(e)
        return None
    lib.thr_analyzer_new.restype = ctypes.c_void_p
    lib.thr_analyzer_new.argtypes = [ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.thr_analyzer_free.argtypes = [ctypes.c_void_p]
    lib.thr_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.thr_vocab_size.restype = ctypes.c_int32
    lib.thr_vocab_size.argtypes = [ctypes.c_void_p]
    lib.thr_vocab_dump.restype = ctypes.c_int64
    lib.thr_vocab_dump.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.thr_postings_count.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.thr_postings_fill.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    _load()
    return _load_error


def build_library() -> bool:
    """Attempt to compile the .so (ingestion-time convenience)."""
    import subprocess

    native_dir = Path(__file__).resolve().parent.parent / "native"
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(["make", "-C", str(native_dir)], check=True, capture_output=True)
    except Exception:
        return False
    global _load_error
    _load_error = None
    return available()


def _i64_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeAnalyzer:
    """C++ tokenizer + vocabulary with the Python Analyzer's semantics."""

    def __init__(self, config: Optional[RAGConfig] = None) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_load_error}")
        self._lib = lib
        self.config = config or get_settings()
        py = Analyzer(self.config)
        stop = sorted(py._stopwords)
        blob = b"\0".join(s.encode() for s in stop) + b"\0"
        self._h = lib.thr_analyzer_new(
            blob, len(stop), self.config.analyzer_min_token_len,
            1 if self.config.analyzer_stemming == "light" else 0,
        )
        # ctypes releases the GIL for the C call, and the handle's vocabulary
        # (unordered_map) is NOT thread-safe — serialize all native calls
        import threading

        self._lock = threading.Lock()

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_h", None):
                self._lib.thr_analyzer_free(self._h)
        except Exception:
            pass

    def tokenize_batch(
        self, texts: Sequence[str], add_to_vocab: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(token_ids i32[total], offsets i64[n+1]) — ids index the internal vocab."""
        encoded = [t.encode("utf-8") for t in texts]
        blob = b"".join(encoded)
        offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum([len(e) for e in encoded], out=offsets[1:])
        out_tok = ctypes.POINTER(ctypes.c_int32)()
        out_off = ctypes.POINTER(ctypes.c_int64)()
        n_tok = ctypes.c_int64()
        with self._lock:
            self._lib.thr_tokenize(
                self._h, blob, _i64_ptr(offsets), len(texts), 1 if add_to_vocab else 0,
                ctypes.byref(out_tok), ctypes.byref(out_off), ctypes.byref(n_tok),
            )
            tokens = np.ctypeslib.as_array(out_tok, shape=(n_tok.value,)).copy()
            offs = np.ctypeslib.as_array(out_off, shape=(len(texts) + 1,)).copy()
        return tokens, offs

    def token_lists(self, texts: Sequence[str], add: bool = True) -> List[List[int]]:
        tokens, offs = self.tokenize_batch(texts, add_to_vocab=add)
        return [tokens[offs[i] : offs[i + 1]].tolist() for i in range(len(texts))]

    def vocab_terms(self) -> List[str]:
        with self._lock:
            need = self._lib.thr_vocab_dump(self._h, None, 0)
            buf = ctypes.create_string_buffer(int(need))
            self._lib.thr_vocab_dump(self._h, buf, need)
        raw = buf.raw[: int(need)]
        return [s.decode("utf-8") for s in raw.split(b"\0")[:-1]]

    @property
    def vocab_size(self) -> int:
        return int(self._lib.thr_vocab_size(self._h))


def native_postings_count(
    tokens: np.ndarray, offsets: np.ndarray, vocab_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pass 1: (df i64[V], doc_lengths f32[n_docs])."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    n_docs = len(offsets) - 1
    tokens = np.ascontiguousarray(tokens, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    df = np.zeros(vocab_size, np.int64)
    doc_len = np.zeros(n_docs, np.float32)
    total_pairs = np.zeros(1, np.int64)
    lib.thr_postings_count(
        _i32_ptr(tokens), _i64_ptr(offsets), n_docs, vocab_size,
        _i64_ptr(df), _f32_ptr(doc_len), _i64_ptr(total_pairs),
    )
    return df, doc_len


def native_postings_fill(
    tokens: np.ndarray,
    offsets: np.ndarray,
    vocab_size: int,
    df: np.ndarray,
    idf: np.ndarray,
    denom: np.ndarray,  # f32[n_docs]
    k1_plus1: float,
    doc_term_cap: int,
) -> dict:
    """Pass 2: CSR + term table (top-weight selection on overflow, Python parity)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    n_docs = len(offsets) - 1
    tokens = np.ascontiguousarray(tokens, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    idf = np.ascontiguousarray(idf, np.float32)
    denom = np.ascontiguousarray(denom, np.float32)
    csr_offsets = np.zeros(vocab_size + 1, np.int64)
    np.cumsum(df, out=csr_offsets[1:])
    nnz = int(csr_offsets[-1])
    postings_doc = np.zeros(nnz, np.int32)
    postings_tf = np.zeros(nnz, np.float32)
    table_ids = np.full((n_docs, doc_term_cap), -2, np.int32)
    table_tfs = np.zeros((n_docs, doc_term_cap), np.float32)
    overflow = np.zeros(1, np.int32)
    lib.thr_postings_fill(
        _i32_ptr(tokens), _i64_ptr(offsets), n_docs, vocab_size,
        _i64_ptr(csr_offsets), _i32_ptr(postings_doc), _f32_ptr(postings_tf),
        doc_term_cap, _f32_ptr(idf), _f32_ptr(denom), ctypes.c_float(k1_plus1),
        _i32_ptr(table_ids), _f32_ptr(table_tfs), _i32_ptr(overflow),
    )
    return {
        "csr_offsets": csr_offsets,
        "postings_doc": postings_doc,
        "postings_tf": postings_tf,
        "table_ids": table_ids,
        "table_tfs": table_tfs,
        "overflow_docs": int(overflow[0]),
    }
