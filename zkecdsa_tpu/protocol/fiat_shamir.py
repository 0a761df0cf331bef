"""Vectorized Fiat-Shamir hashing over device-computed point coordinates.

The reference hashes serialized points one proof element at a time
(reference src/curves/group.ts:221-233 ``hashPoints``: SHA-256 of the
concatenated ``0x04 || x || y`` encodings, truncated to the first 10
bytes = an 80-bit challenge).  The batched pipeline produces whole
[N, ...] blocks of CANONICAL affine coordinates at once
(protocol/batch.py phase outputs), so the challenges are computed here
without constructing a single host point object: canonical digit arrays
are repacked to big-endian byte matrices with numpy bit surgery, message
rows are assembled by array concatenation, and all rows are hashed in one
threaded native SHA-256 call (runtime/native.sha256_rows).

Byte-exactness contract: ``be_bytes`` produces exactly
``big.to_bytes(value, nbytes)`` (bignum/big.py) for every canonical row,
and ``challenge_rows`` equals ``hash_points`` on the corresponding host
points - property-tested in tests/test_utils.py and enforced end-to-end
by the bit-exact pipeline gates (tests/test_pipeline_gate.py).
"""

from __future__ import annotations

import numpy as np

from ..ops.f32field import BASE, BASE_BITS, F32Field
from ..runtime import native

__all__ = ["be_bytes", "point_bytes", "challenge_rows", "PREFIX"]

PREFIX = np.uint8(0x04)


def be_bytes(field: F32Field, arr, nbytes: int) -> np.ndarray:
    """CANONICAL digit array [..., L] -> big-endian bytes [M, nbytes]
    (leading dims flattened).  Exactly ``big.to_bytes(v, nbytes)`` per row;
    requires the canonical invariant (digits in [0, 128), value < 2^(8*nbytes)),
    which every ``canon``/affine-pass output and host-packed array satisfies."""
    a = np.asarray(arr, np.float64).reshape(-1, field.nlimbs)
    assert a.size == 0 or (a.min() >= 0 and a.max() < BASE), (
        "be_bytes requires canonical digits"
    )
    if a.shape[0] == 0:
        return np.empty((0, nbytes), np.uint8)
    d8 = a.astype(np.uint8)
    bits = np.unpackbits(d8[:, :, None], axis=2, bitorder="little")[
        :, :, :BASE_BITS
    ].reshape(len(d8), -1)
    nbits = nbytes * 8
    assert bits.shape[1] >= nbits, "field layout narrower than requested width"
    # canonical values fit nbytes (p < 2^(8*nbytes)); high digit bits are 0
    by = np.packbits(bits[:, :nbits], axis=1, bitorder="little")
    return by[:, ::-1]  # little-endian bytes -> big-endian


def point_bytes(field: F32Field, x, y, nbytes: int) -> np.ndarray:
    """Affine coordinate arrays -> ``0x04 || x || y`` rows
    [M, 1 + 2*nbytes] (the uncompressed wire encoding both curve families
    use; weier.ts:74-89, edwards.ts:194-203).  The identity special case
    (single zero byte, Weierstrass only) is NOT handled here - callers on
    the batched path serialize the (0, 0) affine pair instead, matching
    the existing batched-pipeline semantics."""
    bx = be_bytes(field, x, nbytes)
    by_ = be_bytes(field, y, nbytes)
    out = np.empty((bx.shape[0], 1 + 2 * nbytes), np.uint8)
    out[:, 0] = PREFIX
    out[:, 1 : 1 + nbytes] = bx
    out[:, 1 + nbytes :] = by_
    return out


def challenge_rows(parts: list[np.ndarray]) -> list[int]:
    """One 80-bit Fiat-Shamir challenge per row: SHA-256 of the
    concatenated parts (each [M, k_i] uint8), first 10 bytes as a
    big-endian integer (group.ts:230-233).  All M rows hash in one
    threaded native call."""
    msg = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)
    digests = native.sha256_rows(msg)
    return [
        int.from_bytes(row.tobytes(), "big") for row in digests[:, :10]
    ]
