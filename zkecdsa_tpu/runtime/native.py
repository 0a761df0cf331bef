"""ctypes bindings for the C++ runtime (with pure-Python fallback).

The shared library is built on first use with the system toolchain and
cached next to this file; if the toolchain or build fails, everything
transparently falls back to hashlib/secrets (also native code, via
CPython) - behavior is identical either way, the C++ path adds threaded
batch hashing for the batched prover's Fiat-Shamir phases.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import secrets
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libzkruntime.so")
_SRC = os.path.join(_HERE, "native.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.zk_sha256.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p
            ]
            lib.zk_sha256_batch.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.zk_fill_random.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            lib.zk_fill_random.restype = ctypes.c_int
            # self-check against hashlib before trusting it
            probe = b"zkecdsa-tpu-selftest"
            out = ctypes.create_string_buffer(32)
            lib.zk_sha256(probe, len(probe), out)
            if out.raw != hashlib.sha256(probe).digest():
                raise RuntimeError("native sha256 self-check failed")
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def sha256(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        return hashlib.sha256(data).digest()
    out = ctypes.create_string_buffer(32)
    lib.zk_sha256(data, len(data), out)
    return out.raw


def sha256_batch(messages: list[bytes], threads: int | None = None) -> list[bytes]:
    """Hash many messages; uses the C++ thread pool when available."""
    lib = _load()
    if lib is None:
        return [hashlib.sha256(m).digest() for m in messages]
    if threads is None:
        threads = min(os.cpu_count() or 1, 16)
    blob = b"".join(messages)
    offsets = (ctypes.c_uint64 * (len(messages) + 1))()
    pos = 0
    for i, m in enumerate(messages):
        offsets[i] = pos
        pos += len(m)
    offsets[len(messages)] = pos
    out = ctypes.create_string_buffer(32 * len(messages))
    lib.zk_sha256_batch(blob, offsets, len(messages), out, threads)
    return [out.raw[32 * i : 32 * i + 32] for i in range(len(messages))]


def sha256_rows(arr, threads: int | None = None):
    """Hash every row of a uint8 matrix [M, K]: returns [M, 32] uint8.

    Fixed-stride variant of :func:`sha256_batch` for the batched prover's
    Fiat-Shamir phases: one contiguous buffer + a numpy offset vector, no
    per-row Python bytes objects (at N=1024 the challenge stage hashes
    ~250k serialized-point messages - reference src/exp/exp.ts:158-165 and
    the per-sub-proof hashes of pointAdd.ts:116,145-161 run per round)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    M, K = a.shape
    lib = _load()
    if lib is None:
        out = np.empty((M, 32), np.uint8)
        buf = a.tobytes()
        for i in range(M):
            out[i] = np.frombuffer(
                hashlib.sha256(buf[i * K : (i + 1) * K]).digest(), np.uint8
            )
        return out
    if threads is None:
        threads = min(os.cpu_count() or 1, 16)
    offs = np.arange(M + 1, dtype=np.uint64) * np.uint64(K)
    out = ctypes.create_string_buffer(32 * M)
    lib.zk_sha256_batch(
        a.ctypes.data_as(ctypes.c_char_p),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        M,
        out,
        threads,
    )
    return np.frombuffer(out, dtype=np.uint8).reshape(M, 32).copy()


def fill_random(n: int) -> bytes:
    lib = _load()
    if lib is None:
        return secrets.token_bytes(n)
    out = ctypes.create_string_buffer(n)
    if lib.zk_fill_random(out, n) != 0:
        return secrets.token_bytes(n)
    return out.raw
