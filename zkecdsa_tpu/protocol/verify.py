"""Device-accelerated verification.

The reference verifier folds every sigma-protocol check into one
multi-scalar multiplication per curve, evaluated with a sequential
Bos-Coster heap (reference src/curves/multimult.ts:61-145).  Here the MSM
is dispatched to the batched device kernel instead
(:meth:`zkecdsa_tpu.ops.curve_ops.CurveOps.msm`): per-term windowed
multiplies across VPU lanes + one tree reduction.  Pair counts are padded
to buckets of 64 terms (identity points, zero scalars) so recompilation is
rare and shapes stay static.

``batched_verify_signature_list`` runs the full (host-orchestrated)
verification for a batch of proofs with the device MSM installed - the
relation assembly, Fiat-Shamir hashing and GK recombination remain host
work (they are O(ring) scalar ops, not point ops).
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Sequence

import jax
import jax.numpy as jnp

from ..curves.group import Group, Point
from ..curves.multimult import set_msm_backend
from ..ops.curve_ops import nibble_digits, p256_ops, tom_ops, war_ops
from ..zkp_attest_list import SignatureProofList, SystemParametersList, verify_signature_list

__all__ = ["device_msm", "device_msm_backend", "batched_verify_signature_list"]

_OPS = {"p256": p256_ops, "tomEdwards256": tom_ops, "war256": war_ops}

_PAD = 64


@functools.lru_cache(maxsize=16)
def _jit_msm(group_name: str):
    ops = _OPS[group_name]
    return jax.jit(ops.msm)


def device_msm(group: Group, points: list[Point], scalars: list[int]) -> Point:
    """Evaluate sum(s_i * P_i) on device; pads to 64-term buckets."""
    ops = _OPS[group.name]
    n = len(points)
    padded = -(-n // _PAD) * _PAD
    pts = list(points) + [group.identity()] * (padded - n)
    scs = list(scalars) + [0] * (padded - n)
    arr = jnp.asarray(ops.pack_points(pts))
    digs = jnp.asarray(nibble_digits(scs))
    res = _jit_msm(group.name)(arr, digs)
    return ops.unpack_points(res[None])[0]


@contextmanager
def device_msm_backend():
    """Route MultiMult.evaluate through the device MSM within the scope."""
    set_msm_backend(device_msm)
    try:
        yield
    finally:
        set_msm_backend(None)


def batched_verify_signature_list(
    params: SystemParametersList,
    msg_hashes: Sequence[bytes],
    keys: list[int],
    proofs: Sequence[SignatureProofList],
) -> list[bool]:
    """Batched verification: device round computations + one ladder-MSM
    dispatch per curve for the whole batch (see
    :mod:`zkecdsa_tpu.protocol.batch_verify`)."""
    from .batch_verify import BatchVerifier

    return BatchVerifier(params).verify(msg_hashes, keys, proofs)
