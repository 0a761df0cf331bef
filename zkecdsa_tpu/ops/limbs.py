"""Batched fixed-limb modular arithmetic - the TPU replacement for native
BigInt (SURVEY section 2.4: the reference leans on V8's C++ BigInt for every
arithmetic line; our device path replaces it with vectorized limb kernels).

Representation
--------------
A batch of field elements is a ``uint32`` array ``[..., L]`` of base-2^16
digits, little-endian, canonically reduced (< p) and normalized (each digit
< 2^16).  16-bit digits are chosen so a digit product fits a uint32 lane
exactly ((2^16-1)^2 < 2^32) and column sums of L <= 17 partial products
stay well under 2^32 after a lo/hi split - the widest layout that never
needs 64-bit lanes (TPU has none).

Elements are kept in the Montgomery domain (a*R mod p, R = 2^(16 L));
additive ops are domain-agnostic and multiplication is CIOS Montgomery
(Koc-Acar-Kaliski).  All loops below are static Python unrolls over the
limb index - XLA sees straight-line vector code over the batch dimension;
the batch dimension is where the VPU lanes go.

Everything is shape-polymorphic over leading batch dims and usable inside
``jit``/``vmap``/``shard_map`` and Pallas kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FieldCtx",
    "P256_P",
    "P256_N",
    "TOM_P",
    "TOM_N",
    "WAR_P",
    "set_mul_backend",
]

BASE_BITS = 16
MASK = (1 << BASE_BITS) - 1

# "jnp" (default: fused XLA elementwise path) or "pallas" (VMEM-resident
# Mosaic kernel, TPU only - see ops/pallas/mont.py).
_MUL_BACKEND = "jnp"


def set_mul_backend(name: str) -> None:
    global _MUL_BACKEND
    if name not in ("jnp", "pallas"):
        raise ValueError(name)
    _MUL_BACKEND = name


def _int_to_limbs(x: int, nlimbs: int) -> np.ndarray:
    return np.array(
        [(x >> (BASE_BITS * i)) & MASK for i in range(nlimbs)], dtype=np.uint32
    )


def _limbs_to_int(a: np.ndarray) -> int:
    return sum(int(v) << (BASE_BITS * i) for i, v in enumerate(np.asarray(a)))


class FieldCtx:
    """Montgomery arithmetic context for one modulus.

    All methods taking arrays are pure jnp functions over ``[..., L]``
    uint32 inputs and are safe to trace.
    """

    def __init__(self, name: str, p: int, nlimbs: int | None = None) -> None:
        self.name = name
        self.p = p
        bits = p.bit_length()
        self.nlimbs = nlimbs if nlimbs is not None else -(-bits // BASE_BITS)
        L = self.nlimbs
        if p >= 1 << (BASE_BITS * L):
            raise ValueError("modulus does not fit limb layout")
        self.R = 1 << (BASE_BITS * L)
        self.R_inv = pow(self.R, -1, p)
        self.R2 = self.R * self.R % p
        # n0 = -p^-1 mod 2^16 (the CIOS per-limb quotient constant)
        self.n0 = (-pow(p, -1, 1 << BASE_BITS)) % (1 << BASE_BITS)
        self.p_limbs = _int_to_limbs(p, L)
        self.r2_limbs = _int_to_limbs(self.R2, L)
        self.one_mont = _int_to_limbs(self.R % p, L)
        self.zero = np.zeros(L, dtype=np.uint32)
        # Anti-diagonal gather indices for the product column sums:
        # col[k] = sum_i lo[i, k-i] + sum_i hi[i, k-1-i].  Precomputing the
        # (clipped) index/mask matrices turns the accumulation into two
        # gathers + masked sums instead of 2L sequential updates.
        k = np.arange(2 * L + 1)[None, :]
        i = np.arange(L)[:, None]
        self._idx_lo = np.clip(k - i, 0, L - 1).astype(np.int32)
        self._mask_lo = (k - i >= 0) & (k - i < L)
        self._idx_hi = np.clip(k - i - 1, 0, L - 1).astype(np.int32)
        self._mask_hi = (k - i - 1 >= 0) & (k - i - 1 < L)

    def __repr__(self) -> str:
        return f"FieldCtx({self.name}, {self.nlimbs} limbs)"

    # ---------- host <-> device packing ----------

    def pack(self, values, mont: bool = True) -> np.ndarray:
        """Python ints -> [N, L] uint32 limb array (Montgomery domain by
        default).  Limb split vectorized via a little-endian byte view."""
        p, R, nbytes = self.p, self.R, self.nlimbs * 2
        if mont:
            buf = b"".join((v % p * R % p).to_bytes(nbytes, "little") for v in values)
        else:
            buf = b"".join((v % p).to_bytes(nbytes, "little") for v in values)
        return (
            np.frombuffer(buf, dtype="<u2")
            .reshape(len(values), self.nlimbs)
            .astype(np.uint32)
        )

    def unpack(self, arr, mont: bool = True) -> list[int]:
        """[..., L] limb array -> list of Python ints (flattened leading
        dims)."""
        a = np.ascontiguousarray(
            np.asarray(arr).reshape(-1, self.nlimbs).astype("<u2")
        )
        buf = a.tobytes()
        nbytes = self.nlimbs * 2
        if mont:
            R_inv, p = self.R_inv, self.p
            return [
                int.from_bytes(buf[i : i + nbytes], "little") * R_inv % p
                for i in range(0, len(buf), nbytes)
            ]
        return [
            int.from_bytes(buf[i : i + nbytes], "little")
            for i in range(0, len(buf), nbytes)
        ]

    def pack_scalar(self, v: int, mont: bool = True) -> np.ndarray:
        return self.pack([v], mont)[0]

    # ---------- normalization helpers ----------

    def _carry_u(self, d: jnp.ndarray) -> jnp.ndarray:
        """Unsigned carry propagation over the last axis; digits may be any
        uint32; final carry dropped (caller guarantees no overflow).
        Scan over the limb axis: the graph stays one 4-op body."""

        def step(carry, di):
            t = di + carry
            return t >> BASE_BITS, t & MASK

        _, out = jax.lax.scan(step, jnp.zeros(d.shape[:-1], jnp.uint32),
                              jnp.moveaxis(d, -1, 0))
        return jnp.moveaxis(out, 0, -1)

    def _carry_s(self, d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Signed carry propagation (int32 digits); returns (digits, final
        borrow/carry)."""

        def step(carry, di):
            t = di + carry
            return t >> BASE_BITS, t & MASK  # arithmetic shift: floor div

        carry, out = jax.lax.scan(step, jnp.zeros(d.shape[:-1], jnp.int32),
                                  jnp.moveaxis(d, -1, 0))
        return jnp.moveaxis(out, 0, -1).astype(jnp.uint32), carry

    def _cond_sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """a - p if a >= p else a (a < 2p, normalized digits)."""
        p = jnp.asarray(self.p_limbs, jnp.int32)
        d = a.astype(jnp.int32) - p
        sub, borrow = self._carry_s(d)
        return jnp.where((borrow < 0)[..., None], a, sub)

    # ---------- field ops ----------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = a + b  # digits < 2^17; sum may reach 2p >= 2^(16 L)
        wide = jnp.concatenate([s, jnp.zeros_like(s[..., :1])], axis=-1)
        return self._cond_sub_p_wide(self._carry_u(wide))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d = a.astype(jnp.int32) - b.astype(jnp.int32)
        r, borrow = self._carry_s(d)
        p = jnp.asarray(self.p_limbs, jnp.uint32)
        r_plus_p = self._carry_u(r + p)
        return jnp.where((borrow < 0)[..., None], r_plus_p, r)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        """(-a) mod p; maps 0 to 0."""
        p = jnp.asarray(self.p_limbs, jnp.int32)
        d = p - a.astype(jnp.int32)
        r, _ = self._carry_s(d)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        return jnp.where(is_zero, a, self._cond_sub_p(r))

    def dbl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """a * k for tiny constant k (k <= 8): repeated addition tree."""
        assert 0 <= k <= 8
        if k == 0:
            return jnp.zeros_like(a)
        result = a
        for bit in bin(k)[3:]:
            result = self.add(result, result)
            if bit == "1":
                result = self.add(result, a)
        return result

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^-1 mod p (CIOS).

        Phase 1: full 2L-digit product via a lo/hi column-sum split (each
        column accumulates <= 2L terms < 2^16, far from uint32 overflow).
        Phase 2: L rounds of limb-wise Montgomery reduction; the round
        quotient m_i only needs digit i fully carried, so a single running
        carry suffices and everything else stays lazily unnormalized.
        """
        if _MUL_BACKEND == "pallas":
            from .pallas.mont import mont_mul

            return mont_mul(self, a, b)
        L = self.nlimbs
        a, b = jnp.broadcast_arrays(a, b)
        batch = a.shape[:-1]
        prod = a[..., :, None] * b[..., None, :]  # [..., L, L] u32, exact
        lo = prod & MASK
        hi = prod >> BASE_BITS

        # Column sums of the anti-diagonals via precomputed gathers (each
        # column accumulates <= 2L 16-bit terms, well under uint32).
        # Digits stay unnormalized (< 2^22) - the reduction below only ever
        # needs digit i *plus the running carry*, so no global carry pass
        # is required here.
        idx_lo = jnp.asarray(self._idx_lo)
        idx_hi = jnp.asarray(self._idx_hi)
        bshape = (1,) * len(batch)
        idx_lo = jnp.broadcast_to(
            idx_lo.reshape(bshape + idx_lo.shape), batch + idx_lo.shape
        )
        idx_hi = jnp.broadcast_to(
            idx_hi.reshape(bshape + idx_hi.shape), batch + idx_hi.shape
        )
        lo_d = jnp.where(
            jnp.asarray(self._mask_lo), jnp.take_along_axis(lo, idx_lo, axis=-1), 0
        )
        hi_d = jnp.where(
            jnp.asarray(self._mask_hi), jnp.take_along_axis(hi, idx_hi, axis=-1), 0
        )
        t = jnp.sum(lo_d, axis=-2) + jnp.sum(hi_d, axis=-2)  # [..., 2L+1]

        # Montgomery reduction as a shift-register scan: the L+1-digit
        # window r slides one limb right per round, absorbing m_i * p and
        # the next product column.  One ~15-op body regardless of L.
        p = jnp.asarray(self.p_limbs, jnp.uint32)
        n0 = jnp.uint32(self.n0)

        def step(r, incoming):
            m = (r[..., 0] * n0) & MASK
            mp = m[..., None] * p  # [..., L] u32, exact
            mlo = mp & MASK
            mhi = mp >> BASE_BITS
            c = (r[..., 0] + mlo[..., 0]) >> BASE_BITS
            body = r[..., 1:] + mhi  # [..., L]
            body = body.at[..., :-1].add(mlo[..., 1:])
            body = body.at[..., 0].add(c)
            r_next = jnp.concatenate([body, incoming[..., None]], axis=-1)
            return r_next, None

        incoming = jnp.moveaxis(t[..., L + 1 :], -1, 0)  # L columns
        r, _ = jax.lax.scan(step, t[..., : L + 1], incoming)
        r = self._carry_u(r)
        # CIOS bound: result < 2p, top digit vanishes after one cond-sub.
        return self._cond_sub_p_wide(r)

    def _cond_sub_p_wide(self, a: jnp.ndarray) -> jnp.ndarray:
        """Conditional subtract for an (L+1)-digit value < 2p."""
        L = self.nlimbs
        p = jnp.zeros(L + 1, jnp.int32).at[:L].set(
            jnp.asarray(self.p_limbs, jnp.int32)
        )
        d = a.astype(jnp.int32) - p
        sub, borrow = self._carry_s(d)
        out = jnp.where((borrow < 0)[..., None], a, sub)
        return out[..., :L]

    def sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a static exponent.

        Square-and-multiply-always over the exponent bits via ``lax.scan``:
        the compiled graph is just one squaring + one selected multiply,
        keeping Fermat-inversion graphs small.  (Inversions are amortized
        through :meth:`batch_inv` on hot paths, so the extra always-multiply
        work is irrelevant next to compile-size wins.)"""
        if e == 0:
            return jnp.broadcast_to(
                jnp.asarray(self.one_mont, jnp.uint32), a.shape
            )
        if e < 16:
            result = a
            for bit in bin(e)[3:]:
                result = self.sqr(result)
                if bit == "1":
                    result = self.mul(result, a)
            return result
        bits = jnp.asarray([int(c) for c in bin(e)[3:]], jnp.uint32)

        def step(acc, bit):
            acc = self.sqr(acc)
            acc_mul = self.mul(acc, a)
            return jnp.where(bit > 0, acc_mul, acc), None

        result, _ = jax.lax.scan(step, a, bits)
        return result

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(p-2); stays in the Montgomery domain."""
        return self.pow_const(a, self.p - 2)

    def _prefix_mul(self, a: jnp.ndarray) -> jnp.ndarray:
        """Inclusive prefix products along axis 0 via Hillis-Steele doubling
        inside a ``fori_loop`` (graph: one multiply; depth: log2 N)."""
        n = a.shape[0]
        steps = max(1, (n - 1).bit_length())
        idx = jnp.arange(n).reshape((n,) + (1,) * (a.ndim - 1))

        def body(k, t):
            shift = jnp.uint32(1) << k
            shifted = jnp.roll(t, shift, axis=0)
            prod = self.mul(t, shifted)
            return jnp.where(idx >= shift.astype(jnp.int32), prod, t)

        return jax.lax.fori_loop(0, steps, body, a)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batch inversion over axis 0: one Fermat inversion for the whole
        batch.  inv(x_i) = P_{i-1} * S_{i+1} * inv(T) with P/S the prefix/
        suffix product trees and T the total - fully parallel (depth
        2 log N + one inversion), unlike the sequential two-pass Montgomery
        trick.  Zero entries invert to zero (callers mask separately)."""
        one = jnp.broadcast_to(jnp.asarray(self.one_mont, jnp.uint32), a.shape)
        is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
        safe = jnp.where(is_zero, one, a)
        prefix = self._prefix_mul(safe)
        suffix = jnp.flip(self._prefix_mul(jnp.flip(safe, axis=0)), axis=0)
        total_inv = self.inv(prefix[-1])
        p_prev = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
        s_next = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        invs = self.mul(self.mul(p_prev, s_next), total_inv)
        return jnp.where(is_zero, jnp.zeros_like(a), invs)

    # ---------- domain conversion (device side) ----------

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, jnp.asarray(self.r2_limbs, jnp.uint32))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    # ---------- predicates ----------

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def equal(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def const(self, v: int, mont: bool = True) -> np.ndarray:
        """Constant as a [L] numpy array (Montgomery by default).

        Numpy, not a device array: numpy constants inline as XLA literals;
        a closed-over *device* array becomes a captured buffer operand,
        which this backend executes pathologically slowly (~10^4x)."""
        return self.pack_scalar(v, mont)


# ---- the moduli of the two-curve design (SURVEY section 1) ----

_P256_P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
_P256_N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551
_TOM_P = 0x3FFFFFFFC000000040000000000000002AE382C7957CC4FF9713C3D82BC47D3AF
_WAR_P = 0xFFFFFFFF0000000100000000000000017E72B42B30E7317793135661B1C4B117

P256_P = FieldCtx("p256.p", _P256_P)  # P-256 base field (16 limbs)
P256_N = FieldCtx("p256.n", _P256_N)  # P-256 scalar field
TOM_P = FieldCtx("tom.p", _TOM_P)  # Tom-256 base field (17 limbs, 258-bit)
TOM_N = FieldCtx("tom.n", _P256_P)  # Tom-256 scalar field == P-256 base prime
WAR_P = FieldCtx("war.p", _WAR_P)  # war256 base field
