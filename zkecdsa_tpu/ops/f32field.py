"""Batched modular arithmetic in float32 digit vectors - the TPU field
engine.

The reference leans on V8's C++ BigInt for every arithmetic line (SURVEY
section 2.4); round 1 replaced it with uint32 16-bit-limb Montgomery CIOS
(``git log``: ops/limbs.py), which turned out pathological on the TPU:
every multiplication needed two lane-axis ``take_along_axis`` gathers plus
an L-step ``lax.scan``, measuring ~23,000 ns/element - slow enough that
whole-phase programs blew past the backend's RPC deadline (the BENCH_r01
"kernel fault").  This engine is the redesign: **everything is elementwise
float32 on the VPU**, no gathers, no per-mul scans, no Montgomery domain.
Measured ~85-103 ns/element for a 256-bit modular multiply on the v5e chip
(~230x the uint32 path; see BASELINE.md).

Representation
--------------
A field element batch is a float32 array ``[..., L]`` of base-2^7 digits,
little-endian, integer-valued, non-negative, *redundant* (not fully
carried): the storage invariant is ``digits <= STORED_BOUND`` (~2^14.1)
with the value congruent to the represented residue mod p.  float32 holds
integers exactly below 2^24; every operation is built so all intermediates
stay provably below that.  Bounds are tracked at trace time as plain
Python per-digit bound lists threaded alongside the arrays and checked
with assertions - a violated bound is a trace-time failure, never silent
rounding.

Multiplication is schoolbook convolution with *static* shifts (a Python
loop over digit positions that XLA fuses into straight-line vector code),
then reduction via precomputed fold rows ``RED[t] = 2^(7(L+t)) mod p``:
digits above position L fold onto the low L digits with one broadcasted
multiply-add per row, interleaved with carry rounds (``floor(c/128)``,
exact in f32).  Subtraction adds a precomputed all-digits-large multiple
of p (PADP) so digits never go negative.

Canonicalization (exact value in [0, p), digits in [0, 128)) folds at the
modulus width, estimates the quotient with a float dot, subtracts q*p and
runs one L-step ripple - the only scan in the module, used by ``eq``,
``is_zero`` and device-side window-digit extraction on cold paths.

Everything is shape-polymorphic over leading batch dims and traceable
under ``jit``/``vmap``/``shard_map``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "F32Field",
    "P256_P",
    "P256_N",
    "TOM_P",
    "TOM_N",
    "WAR_P",
    "BASE_BITS",
]

BASE_BITS = 7
BASE = 1 << BASE_BITS  # 128
F32_EXACT = 1 << 24  # integers below this are exact in float32
# storage-invariant digit bound: each carry+carry+fold cycle maps a digit
# bound B to ~B/128^2*127 + 131*127 ~ B/129 + 16.7k, a contraction with
# fixpoint under 25k - so 26000 is always reachable (see _reduce)
STORED_BOUND = 26000
# every public op accepts inputs up to this digit bound (two chained
# ``add_lazy`` results: 4 * STORED_BOUND)
INPUT_BOUND = 4 * STORED_BOUND
_HIGHEST = jax.lax.Precision.HIGHEST


def _int_to_digits(x: int, n: int) -> np.ndarray:
    return np.array(
        [(x >> (BASE_BITS * i)) & (BASE - 1) for i in range(n)], dtype=np.float32
    )


# Digit-convolution implementation (the core of ``F32Field.mul``),
# switchable for chip measurement.  Interleaved same-process chip numbers
# (tools/conv_compare.py, v5e, rows=2^15, two passes, all bit-exact):
#
#   impl      256-bit fmul   Edwards add
#   matmul        59 ns/el     544 ns/el   <- default
#   bf16          67 ns/el     641 ns/el
#   reshape       87 ns/el     853 ns/el
#
#   "matmul"  - one-hot [W*W, 2W-1] f32 HIGHEST MXU dot.  Counter-
#               intuitively fastest: the dot pays (2W-1)x redundant MXU
#               flops but the operands stream once through the MXU, while
#               both "cheaper" alternatives bottleneck elsewhere.
#   "bf16"    - hi/lo-split one-hot bf16 MXU dot (two native-rate passes,
#               exact since post-_prep digits <= 134 make both halves
#               integers <= 256): the two extra elementwise passes that
#               build the split cost more than the MXU passes save.
#   "reshape" - pad-row reshape + two masked VPU reductions (the conv
#               matrix is a segment-sum - one nonzero per row - so this
#               does the minimum arithmetic): VPU reduction throughput
#               loses to the MXU by 1.5x.  Kept as documentation of the
#               negative result.
_CONV_IMPL = os.environ.get("ZKECDSA_CONV", "matmul")


def _conv_reshape(outer3: jnp.ndarray, W: int) -> jnp.ndarray:
    """Anti-diagonal sums of ``outer3`` [..., W, W] -> [..., 2W-1] with no
    MXU pass: pad each row by one zero and flatten - entry (i, j) lands at
    p = i*(W+1) + j; viewing the flat array as G [W+1, W] (p = r*W + c)
    gives k := i + j = (r - i)*W + c with r - i in {0, 1}, and r == i
    exactly when r <= c.  So cols[c] = sum of column c where r <= c and
    cols[W + c] = sum where r > c: two masked reductions, no [W*W, 2W-1]
    one-hot operand, exact (all partial sums stay below the caller's
    < 2^24 column bound)."""
    lead = outer3.shape[:-2]
    F2 = jnp.pad(
        outer3, [(0, 0)] * len(lead) + [(0, 0), (0, 1)]
    ).reshape(lead + (W + 1, W))
    r = jax.lax.broadcasted_iota(jnp.int32, (W + 1, W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (W + 1, W), 1)
    low = jnp.sum(jnp.where(r <= c, F2, 0.0), axis=-2)  # [..., W]
    high = jnp.sum(jnp.where(r > c, F2, 0.0), axis=-2)
    return jnp.concatenate([low, high[..., : W - 1]], axis=-1)


def _conv_mat(W: int) -> jnp.ndarray:
    """One-hot [W*W, 2W-1] tensor with M[i*W+j, i+j] = 1: contracts an
    outer product of digit vectors into convolution columns with ONE
    dot_general.  Replaces the 40-step static-shift update-slice loop -
    same exact integer arithmetic (all products and partial sums stay
    below 2^24, so any f32 accumulation order is exact under HIGHEST
    precision), ~20x fewer HLO ops per multiply (the round-2 phase
    programs were ~90k StableHLO ops and took 841 s to compile on the
    chip), and measured slightly FASTER on the v5e MXU than the VPU
    update-slice schoolbook (48.6 vs 52.6 ns/element,
    tools/chip_microbench.py).

    Built from iota ops (not a dense literal): a [W*W, 2W-1] f32 constant
    inlined at every mul call site blew the StableHLO text to 200 MB;
    the iota subgraph is ~6 tiny ops, CSE'd across call sites and
    constant-folded once by XLA."""
    m = jax.lax.broadcasted_iota(jnp.int32, (W * W, 2 * W - 1), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (W * W, 2 * W - 1), 1)
    return ((m // W + m % W) == k).astype(jnp.float32)


class F32Field:
    """Modular arithmetic context for one modulus (see module docstring).

    API-compatible with the retired uint32 ``FieldCtx`` (pack/unpack keep
    their ``mont`` flag as an ignored no-op; this engine is plain-domain).
    """

    def __init__(self, name: str, p: int, nlimbs: int | None = None) -> None:
        self.name = name
        self.p = p
        bits = p.bit_length()
        self.nlimbs = nlimbs if nlimbs is not None else -(-bits // BASE_BITS) + 2
        L = self.nlimbs
        if bits > BASE_BITS * (L - 2):
            raise ValueError("modulus too large for limb layout")
        self.dtype = jnp.float32
        # fold rows anchored at L: RED[t] = base^(L+t) mod p
        nred = L + 8
        self.red = np.stack(
            [_int_to_digits(pow(BASE, L + t, p), L) for t in range(nred)]
        )  # [nred, L], digits < 128
        # fold rows anchored at the modulus width (for canon)
        self.lp = -(-bits // BASE_BITS)
        self.red_lp = np.stack(
            [
                _int_to_digits(pow(BASE, self.lp + t, p), self.lp)
                for t in range(L + 8 - self.lp)
            ]
        )  # [rows, lp]
        self.p_digits = _int_to_digits(p, L)
        # PADP: multiple of p with every digit in [INPUT_BOUND-127,
        # INPUT_BOUND]; (PADP - b) is digitwise non-negative for any valid b
        V = sum(INPUT_BOUND << (BASE_BITS * i) for i in range(L))
        rem = _int_to_digits(V % p, L)
        self.padp = np.full(L, float(INPUT_BOUND), np.float32) - rem
        # float reciprocal powers for the canon quotient estimate
        self._pw = np.array(
            [float(pow(BASE, i)) / float(p) for i in range(L + 4)], np.float32
        )
        self.zero = np.zeros(L, np.float32)
        self.one = _int_to_digits(1, L)
        self.one_mont = self.one  # compat shim (plain domain)

    def __repr__(self) -> str:
        return f"F32Field({self.name}, {self.nlimbs} digits)"

    # ---------- host <-> device packing ----------

    def pack(self, values, mont: bool = True) -> np.ndarray:
        """Python ints -> [N, L] float32 canonical digits (``mont`` is a
        compat no-op).  Vectorized via a little-endian byte view plus bit
        surgery (base 128 does not align with bytes)."""
        p, L = self.p, self.nlimbs
        nbytes = -(-(BASE_BITS * L) // 8)
        buf = b"".join((v % p).to_bytes(nbytes, "little") for v in values)
        by = np.frombuffer(buf, dtype=np.uint8).reshape(len(values), nbytes)
        bits = np.unpackbits(by, axis=1, bitorder="little")[:, : BASE_BITS * L]
        # uint8 multiply-sum, not a float BLAS matmul: the [n, L, 7] f32
        # contraction went through threaded BLAS, which collapses under
        # host load (measured 0.8 s quiet -> 15 s while the test suite
        # runs); the integer path is ~2x faster quiet and load-stable
        w = (1 << np.arange(BASE_BITS, dtype=np.uint8))
        return (
            (bits.reshape(len(values), L, BASE_BITS) * w)
            .sum(axis=2, dtype=np.int16)
            .astype(np.float32)
        )

    def unpack(self, arr, mont: bool = True) -> list[int]:
        """[..., L] digit array -> canonical Python ints (flattened leading
        dims).  Handles redundant digits; exact."""
        a = np.asarray(arr, np.float64).reshape(-1, self.nlimbs)
        ints = a.astype(np.int64)
        p = self.p
        shifts = [BASE_BITS * i for i in range(self.nlimbs)]
        return [
            sum(int(d) << s for d, s in zip(row, shifts)) % p for row in ints
        ]

    def unpack_canonical(self, arr) -> list[int]:
        """[..., L] CANONICAL digit array (digits in [0, 128), value in
        [0, p) - i.e. ``canon`` output or host-packed) -> Python ints.
        Vectorized bit repacking + one ``int.from_bytes`` per row: ~40x
        the per-digit Python loop of :meth:`unpack`, which dominated the
        batched prover's unpack stages at N=1024 (VERDICT r2 weak #10)."""
        a = np.asarray(arr, np.float64).reshape(-1, self.nlimbs)
        assert a.size == 0 or (a.min() >= 0 and a.max() < BASE), (
            "unpack_canonical requires canonical digits"
        )
        d8 = a.astype(np.uint8)
        bits = np.unpackbits(d8[:, :, None], axis=2, bitorder="little")[
            :, :, :BASE_BITS
        ].reshape(len(d8), -1)
        nbytes = -(-bits.shape[1] // 8)
        pad = np.zeros((len(d8), nbytes * 8 - bits.shape[1]), np.uint8)
        by = np.packbits(
            np.concatenate([bits, pad], axis=1), axis=1, bitorder="little"
        )
        return [int.from_bytes(row.tobytes(), "little") for row in by]

    def pack_scalar(self, v: int, mont: bool = True) -> np.ndarray:
        return self.pack([v], mont)[0]

    def const(self, v: int, mont: bool = True) -> np.ndarray:
        """Constant as a [L] numpy array (inlines as an XLA literal)."""
        return self.pack_scalar(v)

    # ---------- bound-tracked normalization core ----------
    #
    # ``b`` is a Python list of per-digit-position bounds (trace-time).

    @staticmethod
    def _carry_round(c: jnp.ndarray, b: list[int]):
        """One carry round: each digit -> [0,128) + incoming carry."""
        assert max(b) < F32_EXACT
        f = jnp.floor(c * (1.0 / BASE))
        d = c - f * float(BASE)
        # widen by one digit and add the carries shifted up one position
        # (concat+add, not scatter-add: Mosaic has no scatter lowering and
        # XLA fuses the pad/add chain better than dynamic-update-slice-add)
        z1 = jnp.zeros_like(d[..., :1])
        out = jnp.concatenate([d, z1], axis=-1) + jnp.concatenate(
            [z1, f], axis=-1
        )
        nb = [min(b[0], BASE - 1)]
        for i in range(1, len(b)):
            nb.append(min(b[i], BASE - 1) + b[i - 1] // BASE)
        nb.append(b[-1] // BASE)
        return out, nb

    def _fold_at(self, c: jnp.ndarray, b: list[int], anchor: int, red: np.ndarray):
        """Fold digits at positions >= anchor onto [0, anchor) with rows of
        ``red`` (= base^(anchor+t) mod p)."""
        rows = len(b) - anchor
        assert 1 <= rows <= red.shape[0]
        spill = sum(b[anchor + t] for t in range(rows))
        lo_b = max(b[:anchor])
        new_bound = lo_b + spill * (BASE - 1)
        assert new_bound < F32_EXACT, (lo_b, spill, new_bound)
        hi = c[..., anchor:]
        folded = c[..., :anchor] + jnp.einsum(
            "...r,rl->...l", hi, jnp.asarray(red[:rows]), precision=_HIGHEST
        )
        return folded, [min(bi + spill * (BASE - 1), new_bound) for bi in b[:anchor]]

    def _reduce(self, c: jnp.ndarray, b) -> jnp.ndarray:
        """Bring (width >= L, given bounds) to the storage invariant
        (width L, digits <= STORED_BOUND).  The carry/fold schedule is
        derived at trace time from the tracked bounds."""
        L = self.nlimbs
        if isinstance(b, int):
            b = [b] * c.shape[-1]
        assert len(b) == c.shape[-1]
        for _ in range(64):
            if len(b) == L and max(b) <= STORED_BOUND:
                return c
            if len(b) > L:
                spill = sum(b[L + t] for t in range(len(b) - L))
                fold_res = max(b[:L]) + spill * (BASE - 1)
                # fold when exact AND either it lands inside the invariant
                # or the digits are near-normalized (folding then strictly
                # contracts the value; see STORED_BOUND derivation)
                if fold_res < F32_EXACT and (
                    fold_res <= STORED_BOUND or max(b) <= 192
                ):
                    c, b = self._fold_at(c, b, L, self.red)
                    continue
            c, b = self._carry_round(c, b)
        raise AssertionError(f"_reduce did not converge: bounds={b}")

    # ---------- field ops ----------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Normalizing add (safe for arbitrary chaining, e.g. tree sums)."""
        return self._reduce(a + b, 2 * INPUT_BOUND)

    def add_lazy(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Digit add without normalization.  Caller owns the bound: at
        most two lazy adds may feed any other op (INPUT_BOUND)."""
        return a + b

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a - b via the PADP offset (digits stay non-negative)."""
        d = a + (jnp.asarray(self.padp) - b)
        return self._reduce(d, 2 * INPUT_BOUND)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._reduce(jnp.asarray(self.padp) - a, INPUT_BOUND)

    def dbl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._reduce(a + a, 2 * INPUT_BOUND)

    def mul_small(self, a: jnp.ndarray, k: int) -> jnp.ndarray:
        """a * k for a small non-negative integer constant."""
        assert 0 <= k <= 64
        if k == 0:
            return jnp.zeros_like(a)
        return self._reduce(a * float(k), k * INPUT_BOUND)

    def _prep(self, a: jnp.ndarray):
        """Carry an operand until its digit bound is multiplication-safe."""
        b = [INPUT_BOUND] * a.shape[-1]
        c = a
        while (2 * len(b) + 1) * max(b) * max(b) >= F32_EXACT:
            c, b = self._carry_round(c, b)
        return c, b

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Modular product; inputs may carry up to two lazy adds."""
        a, ba = self._prep(a)
        b, bb = self._prep(b)
        a, b = jnp.broadcast_arrays(a, b)
        W = a.shape[-1]
        mba, mbb = max(ba), max(bb)
        cols_bound = W * mba * mbb
        assert cols_bound < F32_EXACT, (mba, mbb, W)
        # schoolbook convolution of the digit vectors; exact in f32:
        # every product and partial sum stays below 2^24 (see _CONV_IMPL)
        if _CONV_IMPL == "reshape":
            cols = _conv_reshape(a[..., :, None] * b[..., None, :], W)
        elif _CONV_IMPL == "bf16":
            assert mba * mbb < (1 << 15), (mba, mbb)  # hi/lo bf16-exact
            outer = (a[..., :, None] * b[..., None, :]).reshape(
                a.shape[:-1] + (W * W,)
            )
            hi = jnp.floor(outer * (1.0 / BASE))
            lo = outer - hi * float(BASE)
            m16 = _conv_mat(W).astype(jnp.bfloat16)
            cols = jnp.einsum(
                "...m,mk->...k", hi.astype(jnp.bfloat16), m16,
                preferred_element_type=jnp.float32,
            ) * float(BASE) + jnp.einsum(
                "...m,mk->...k", lo.astype(jnp.bfloat16), m16,
                preferred_element_type=jnp.float32,
            )
        else:
            outer = (a[..., :, None] * b[..., None, :]).reshape(
                a.shape[:-1] + (W * W,)
            )
            cols = jnp.einsum(
                "...m,mk->...k", outer, _conv_mat(W), precision=_HIGHEST
            )
        cb = [min(k + 1, W, 2 * W - 1 - k) * mba * mbb for k in range(2 * W - 1)]
        return self._reduce(cols, cb)

    def sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a static exponent; square-and-multiply-always under
        ``lax.scan`` so the graph stays one squaring + one multiply."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.one), a.shape)
        if e < 16:
            result = a
            for bit in bin(e)[3:]:
                result = self.sqr(result)
                if bit == "1":
                    result = self.mul(result, a)
            return result
        bits = jnp.asarray([float(c) for c in bin(e)[3:]], jnp.float32)

        def step(acc, bit):
            acc = self.sqr(acc)
            acc_mul = self.mul(acc, a)
            return jnp.where(bit > 0, acc_mul, acc), None

        result, _ = jax.lax.scan(step, a, bits)
        return result

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion a^(p-2); maps (any representative of) 0 to 0."""
        return self.pow_const(a, self.p - 2)

    def _prefix_mul(self, a: jnp.ndarray) -> jnp.ndarray:
        """Inclusive prefix products along axis 0, Hillis-Steele doubling
        with *static* shifts (log2 N multiplies, no dynamic roll)."""
        n = a.shape[0]
        t = a
        shift = 1
        while shift < n:
            shifted = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        jnp.asarray(self.one), (min(shift, n),) + t.shape[1:]
                    ),
                    t[: max(n - shift, 0)],
                ],
                axis=0,
            )
            t = self.mul(t, shifted)
            shift *= 2
        return t

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batch inversion over axis 0: one Fermat inversion total.
        inv(x_i) = P_{i-1} * S_{i+1} * inv(T) with prefix/suffix product
        trees.  Zero entries (any representative) invert to digit-zero."""
        one = jnp.broadcast_to(jnp.asarray(self.one), a.shape)
        is_zero = self.is_zero(a)[..., None]
        safe = jnp.where(is_zero, one, a)
        prefix = self._prefix_mul(safe)
        suffix = jnp.flip(self._prefix_mul(jnp.flip(safe, axis=0)), axis=0)
        total_inv = self.inv(prefix[-1])
        p_prev = jnp.concatenate([one[:1], prefix[:-1]], axis=0)
        s_next = jnp.concatenate([suffix[1:], one[:1]], axis=0)
        invs = self.mul(self.mul(p_prev, s_next), total_inv)
        return jnp.where(is_zero, jnp.zeros_like(a), invs)

    # ---------- canonicalization / predicates ----------

    def _ripple(self, x: jnp.ndarray):
        """Exact full carry propagation (signed digits, floor semantics);
        returns (digits in [0,128), final carry).  L-step scan - use on
        cold/small paths only."""

        def step(carry, d):
            t = d + carry
            f = jnp.floor(t * (1.0 / BASE))
            return f, t - f * float(BASE)

        carry, out = jax.lax.scan(
            step, jnp.zeros(x.shape[:-1], jnp.float32), jnp.moveaxis(x, -1, 0)
        )
        return jnp.moveaxis(out, 0, -1), carry

    def canon(self, a: jnp.ndarray) -> jnp.ndarray:
        """Exact canonical digits: value in [0, p), digits in [0, 128),
        width L (positions >= lp are zero)."""
        L, lp = self.nlimbs, self.lp
        c = self._reduce(a, INPUT_BOUND)
        b = [STORED_BOUND] * L
        c, b = self._carry_round(c, b)
        c, b = self._carry_round(c, b)  # digits < ~130, width L+2
        # fold at the modulus width: value drops under ~2^(7*lp+8), so the
        # quotient fits a float32 dot exactly
        c, b = self._fold_at(c, b, lp, self.red_lp)
        c, b = self._carry_round(c, b)
        c, b = self._carry_round(c, b)  # width lp+2, digits < ~130
        q = jnp.floor(
            jnp.einsum(
                "...l,l->...", c, jnp.asarray(self._pw[: len(b)]),
                precision=_HIGHEST,
            )
        )
        # under-estimate so the remainder stays non-negative
        q = jnp.clip(q - 1.0, 0.0, None)
        # q < 2^12; q * p_digit products < 2^19: exact
        pd = jnp.asarray(np.concatenate([self.p_digits[:lp], np.zeros(2, np.float32)]))
        c = c - q[..., None] * pd
        c, _ = self._ripple(c)  # remainder in [0, 3p)
        for _ in range(3):  # conditional subtracts
            d, borrow = self._ripple(c - pd)
            c = jnp.where((borrow < 0)[..., None], c, d)
        pad = jnp.zeros(c.shape[:-1] + (L - lp - 2,), jnp.float32)
        return jnp.concatenate([c, pad], axis=-1)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(self.canon(a) == 0, axis=-1)

    def equal(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(self.canon(a) == self.canon(b), axis=-1)

    # ---------- domain shims (plain domain: identities) ----------

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return a

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return a

    # ---------- digit extraction (device) ----------

    def digits4(self, x: jnp.ndarray, width: int = 64) -> jnp.ndarray:
        """MSB-first 4-bit window digits of the canonical value:
        [..., width] float32 in [0, 16).  Always canonicalizes first, so it
        is correct for *any* valid digit array - including the redundant
        (value-only-congruent) outputs every device op produces.  For
        host-packed inputs that are canonical by construction,
        :meth:`digits4_canonical` skips the canon ripple."""
        return self.digits4_canonical(self.canon(x), width)

    def digits4_canonical(self, x: jnp.ndarray, width: int = 64) -> jnp.ndarray:
        """Fast-path window-digit extraction for inputs that are ALREADY
        canonical (digits in [0, 128), value in [0, p)) - i.e. host-packed
        via :meth:`pack` or the output of :meth:`canon`.  Feeding redundant
        device-computed digits here silently extracts wrong windows (the
        round-2 batched-pipeline regression); use :meth:`digits4` unless
        the input is provably canonical.

        Bit j of the value is bit (j mod 7) of canonical digit (j div 7);
        a nibble spans at most two digits.  Vectorized as two one-hot
        selection matmuls (exact: digits < 128) plus elementwise shifts -
        the former 64-iteration Python loop cost ~1.3k HLO ops per call
        and dominated the phase programs' compile time."""
        c = x
        L = self.nlimbs
        # per-output-nibble source digit / bit offset, MSB-first
        ks = [width - 1 - k for k in range(width)]
        a_idx = np.array([(4 * k) // BASE_BITS for k in ks], np.int64)
        s = np.array([(4 * k) % BASE_BITS for k in ks], np.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, width), 0)
        sel_a = (rows == jnp.asarray(a_idx, jnp.int32)[None, :]).astype(
            jnp.float32
        )  # zero column when the source digit is beyond L
        sel_b = (rows == jnp.asarray(a_idx + 1, jnp.int32)[None, :]).astype(
            jnp.float32
        )
        da = jnp.einsum("...l,lw->...w", c, sel_a, precision=_HIGHEST)
        db = jnp.einsum("...l,lw->...w", c, sel_b, precision=_HIGHEST)
        inv_shift = jnp.asarray(np.exp2(-s).astype(np.float32))
        hi_mult = jnp.asarray(np.exp2(BASE_BITS - s).astype(np.float32))
        v = jnp.floor(da * inv_shift) + db * hi_mult
        return v - jnp.floor(v * (1.0 / 16.0)) * 16.0

    def digits8_canonical(self, x: jnp.ndarray, width: int = 32) -> jnp.ndarray:
        """LSB-first 8-bit window digits of a CANONICAL digit array
        (digits in [0, 128), value in [0, p)): [..., width] float32 in
        [0, 256).  Feeds the comb fixed-base scalar multiplication
        (``CurveOps.mul_comb``).  Byte i is bits 8i..8i+7; with 7-bit
        storage digits a byte spans at most two digits (offset <= 6, so
        6+8 <= 14), extracted with two one-hot selection matmuls - exact:
        floor(da/2^s) + db*2^(7-s) equals floor((da + 128 db)/2^s) because
        2^s divides 128."""
        L = self.nlimbs
        a_idx = np.array([(8 * k) // BASE_BITS for k in range(width)], np.int64)
        s = np.array([(8 * k) % BASE_BITS for k in range(width)], np.float32)
        assert a_idx[-1] + 1 < L, "scalar width exceeds digit layout"
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, width), 0)
        sel_a = (rows == jnp.asarray(a_idx, jnp.int32)[None, :]).astype(
            jnp.float32
        )
        sel_b = (rows == jnp.asarray(a_idx + 1, jnp.int32)[None, :]).astype(
            jnp.float32
        )
        da = jnp.einsum("...l,lw->...w", x, sel_a, precision=_HIGHEST)
        db = jnp.einsum("...l,lw->...w", x, sel_b, precision=_HIGHEST)
        v = jnp.floor(da * jnp.asarray(np.exp2(-s).astype(np.float32)))
        v = v + db * jnp.asarray(np.exp2(BASE_BITS - s).astype(np.float32))
        return v - jnp.floor(v * (1.0 / 256.0)) * 256.0


# ---- the moduli of the two-curve design (SURVEY section 1) ----

_P256_P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
_P256_N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551
_TOM_P = 0x3FFFFFFFC000000040000000000000002AE382C7957CC4FF9713C3D82BC47D3AF
_WAR_P = 0xFFFFFFFF0000000100000000000000017E72B42B30E7317793135661B1C4B117

# uniform 40-digit layout (280 bits of headroom covers the 265-bit Tom
# modulus); one width keeps a single compiled shape family everywhere
P256_P = F32Field("p256.p", _P256_P, 40)  # P-256 base field
P256_N = F32Field("p256.n", _P256_N, 40)  # P-256 scalar field
TOM_P = F32Field("tom.p", _TOM_P, 40)  # Tom-256 base field (265-bit)
TOM_N = F32Field("tom.n", _P256_P, 40)  # Tom-256 scalar field == P-256 base
WAR_P = F32Field("war.p", _WAR_P, 40)  # war256 base field
