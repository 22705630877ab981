"""ctypes bindings for the native host-side library (native/rwkv_native.so).

The native library owns the CPU-bound data plane: ggmf file scanning,
multithreaded block quantization, streaming file requantization, and the
World trie tokenizer. Everything here has a pure-Python fallback (io/ +
utils/), and the two are validated bit-exact against each other
(tests/test_native.py); use `is_available()` to check for the built library.

Build: `python -m rwkv_tpu.native` or
       `cmake -S native -B native/build && cmake --build native/build`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent
_NATIVE_DIR = _REPO_ROOT / "native"
_LIB_CANDIDATES = [
    _NATIVE_DIR / "build" / "librwkv_native.so",
    _NATIVE_DIR / "librwkv_native.so",
]


class _Header(ctypes.Structure):
    _fields_ = [(n, ctypes.c_uint32) for n in
                ("magic", "version", "n_vocab", "n_embed", "n_layer", "data_type")]


class _TensorInfo(ctypes.Structure):
    _fields_ = [
        ("name", ctypes.c_char * 128),
        ("dtype", ctypes.c_uint32),
        ("n_dims", ctypes.c_uint32),
        ("shape", ctypes.c_uint32 * 4),
        ("offset", ctypes.c_uint64),
        ("nbytes", ctypes.c_uint64),
    ]


_lib = None


def build(force: bool = False) -> Optional[Path]:
    """Build the native library with cmake (preferred) or g++ directly."""
    out = _LIB_CANDIDATES[0]
    if out.exists() and not force:
        return out
    try:
        subprocess.run(
            ["cmake", "-S", str(_NATIVE_DIR), "-B", str(_NATIVE_DIR / "build"),
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", str(_NATIVE_DIR / "build"), "-j"],
            check=True, capture_output=True,
        )
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass
    # g++ fallback
    out = _LIB_CANDIDATES[1]
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             str(_NATIVE_DIR / "rwkv_native.cpp"), "-o", str(out)],
            check=True, capture_output=True,
        )
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for cand in _LIB_CANDIDATES:
        if cand.exists():
            lib = ctypes.CDLL(str(cand))
            break
    else:
        return None

    lib.rwkv_native_last_error.restype = ctypes.c_char_p
    lib.rwkv_ggmf_read_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(_Header)]
    lib.rwkv_ggmf_scan.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(_TensorInfo), ctypes.c_int64]
    lib.rwkv_ggmf_scan.restype = ctypes.c_int64
    lib.rwkv_quant_row_size.argtypes = [ctypes.c_uint32, ctypes.c_int64]
    lib.rwkv_quant_row_size.restype = ctypes.c_int64
    lib.rwkv_quantize_block_data.argtypes = [
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int]
    lib.rwkv_dequantize_block_data.argtypes = [
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.rwkv_quantize_model_file.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.rwkv_tokenizer_init.argtypes = [ctypes.c_char_p]
    lib.rwkv_tokenizer_init.restype = ctypes.c_void_p
    lib.rwkv_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.rwkv_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.rwkv_tokenizer_encode.restype = ctypes.c_int64
    lib.rwkv_tokenizer_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.rwkv_tokenizer_decode.restype = ctypes.c_int64
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def _check(rc, lib):
    if rc != 0:
        raise RuntimeError(lib.rwkv_native_last_error().decode())


def read_header(path: str) -> dict:
    lib = _load()
    hdr = _Header()
    _check(lib.rwkv_ggmf_read_header(path.encode(), ctypes.byref(hdr)), lib)
    return {f: getattr(hdr, f) for f, _ in _Header._fields_}


def scan_tensors(path: str) -> list[dict]:
    lib = _load()
    n = lib.rwkv_ggmf_scan(path.encode(), None, 0)
    if n < 0:
        raise RuntimeError(lib.rwkv_native_last_error().decode())
    infos = (_TensorInfo * n)()
    n2 = lib.rwkv_ggmf_scan(path.encode(), infos, n)
    assert n2 == n
    return [
        {
            "name": i.name.decode(),
            "dtype": i.dtype,
            "shape": tuple(i.shape[: i.n_dims]),
            "offset": i.offset,
            "nbytes": i.nbytes,
        }
        for i in infos
    ]


def quantize_rows(x: np.ndarray, dtype: int, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    n_threads = n_threads or (os.cpu_count() or 1)
    size = lib.rwkv_quant_row_size(dtype, x.size)
    if size < 0:
        raise ValueError("bad dtype/element count")
    out = np.empty(size, np.uint8)
    _check(
        lib.rwkv_quantize_block_data(
            dtype,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            x.size, n_threads,
        ),
        lib,
    )
    return out


def dequantize_rows(data: np.ndarray, dtype: int, n_elems: int, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n_threads = n_threads or (os.cpu_count() or 1)
    out = np.empty(n_elems, np.float32)
    _check(
        lib.rwkv_dequantize_block_data(
            dtype,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_elems, n_threads,
        ),
        lib,
    )
    return out


def quantize_model_file(in_path: str, out_path: str, target_dtype: int,
                        n_threads: int = 0) -> tuple[int, int]:
    lib = _load()
    n_threads = n_threads or (os.cpu_count() or 1)
    orig = ctypes.c_uint64()
    new = ctypes.c_uint64()
    _check(
        lib.rwkv_quantize_model_file(
            in_path.encode(), out_path.encode(), target_dtype, n_threads,
            ctypes.byref(orig), ctypes.byref(new),
        ),
        lib,
    )
    return orig.value, new.value


class NativeWorldTokenizer:
    """Native trie tokenizer with the same encode/decode surface as
    rwkv_tpu.utils.world_tokenizer.WorldTokenizer."""

    def __init__(self, vocab_path: Optional[str] = None):
        from rwkv_tpu.utils.world_tokenizer import DEFAULT_VOCAB

        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._tok = lib.rwkv_tokenizer_init(str(vocab_path or DEFAULT_VOCAB).encode())
        if not self._tok:
            raise RuntimeError(lib.rwkv_native_last_error().decode())

    def __del__(self):
        if getattr(self, "_tok", None):
            self._lib.rwkv_tokenizer_free(self._tok)
            self._tok = None

    def encode_bytes(self, src: bytes) -> list[int]:
        buf = np.frombuffer(src, np.uint8)
        out = np.empty(len(src) + 1, np.int32)
        n = self._lib.rwkv_tokenizer_encode(
            self._tok,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(src),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.size,
        )
        if n < 0:
            raise ValueError(self._lib.rwkv_native_last_error().decode())
        return out[:n].tolist()

    def decode_bytes(self, tokens) -> bytes:
        toks = np.asarray(tokens, np.int32)
        cap = max(16, int(toks.size) * 64)
        out = np.empty(cap, np.uint8)
        n = self._lib.rwkv_tokenizer_decode(
            self._tok,
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            toks.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n < 0:
            raise ValueError(self._lib.rwkv_native_last_error().decode())
        return out[:n].tobytes()

    def encode(self, s: str) -> list[int]:
        return self.encode_bytes(s.encode("utf-8"))

    def decode(self, tokens) -> str:
        return self.decode_bytes(tokens).decode("utf-8", errors="replace")


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"native library: {path if path else 'BUILD FAILED'}")
