"""Batched elliptic-curve kernels on limb arrays (the TPU curve layer).

A batch of points is a float32 digit array ``[..., C, L]`` (C = 3
projective coordinates for Weierstrass, 4 extended coordinates for
Edwards; L = base-2^7 field digits, see ops/f32field.py).  All formulas are the *complete/unified*
published ones - Renes-Costello-Batina 2015 for a = -3 short Weierstrass,
Hisil et al. 2008 for twisted Edwards - the same algebra as the host layer
(zkecdsa_tpu/curves/weier.py, edwards.py), evaluated branchlessly so
identity and doubling cases need no control flow: exactly what XLA wants.

Scalar multiplication uses the reference's 4-bit fixed-window shape
(reference src/curves/group.ts:133-152) as a ``lax.scan`` over nibble
columns with a per-point 16-entry table; ``double_mul`` shares the
doublings (group.ts:97-132).  ``msm`` evaluates sum(s_i P_i) by running all
per-term multiplies in parallel lanes and tree-reducing - the batched
replacement for the reference's sequential Bos-Coster heap
(multimult.ts:61-145).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .f32field import F32Field, P256_P, TOM_P, WAR_P

__all__ = [
    "WeierOps",
    "EdwardsOps",
    "p256_ops",
    "tom_ops",
    "war_ops",
    "nibble_digits",
    "scalar_bits",
]

WINDOW = 4
NDIGITS_256 = 64  # 256-bit scalars, 4-bit windows
TABLE = 1 << WINDOW


def nibble_digits(scalars, width: int = NDIGITS_256) -> np.ndarray:
    """Base-16 digits, most significant first: [N, width] int32.
    Vectorized via a big-endian byte view (width must be even)."""
    nbytes = width // 2
    buf = b"".join(int(s).to_bytes(nbytes, "big") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), nbytes)
    out = np.empty((len(scalars), width), dtype=np.int32)
    out[:, 0::2] = by >> 4
    out[:, 1::2] = by & 0xF
    return out


def scalar_bits(scalars, width: int = 256) -> np.ndarray:
    """Bits, most significant first: [N, width] uint8 (for msm_ladder)."""
    buf = b"".join(int(s).to_bytes(width // 8, "big") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), width // 8)
    return np.unpackbits(by, axis=1)


def byte_digits(scalars, width: int = 32) -> np.ndarray:
    """Base-256 digits, LEAST significant first: [N, width] int32 (the comb
    fixed-base path's digit order, CurveOps.mul_comb)."""
    buf = b"".join(int(s).to_bytes(width, "little") for s in scalars)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), width)
    return by.astype(np.int32)


class CurveOps:
    """Shared machinery; subclasses provide the group law."""

    NCOORD: int = 3

    def __init__(self, field: F32Field) -> None:
        self.f = field
        # Every public device entry point is jitted at construction: on the
        # tunneled TPU backend, eager dispatch costs ~1-15 ms/op and eager
        # lax.scan is interpreted (measured ~26,000x slower than the jitted
        # scan for the windowed scalar-mul) - composition must happen under
        # jit.  Traces cache per shape; the persistent compilation cache
        # makes them survive process restarts.
        self.add = jax.jit(self.add)
        self.dbl = jax.jit(self.dbl)
        self.neg = jax.jit(self.neg)
        self.table = jax.jit(self.table)
        self.scalar_mul_table = jax.jit(self.scalar_mul_table)
        self.scalar_mul = jax.jit(self.scalar_mul)
        self.double_mul_tables = jax.jit(self.double_mul_tables)
        self.double_mul = jax.jit(self.double_mul)
        self.sum_reduce = jax.jit(self.sum_reduce, static_argnames=("axis",))
        self.comb_table = jax.jit(self.comb_table)
        self.comb4_table = jax.jit(self.comb4_table)
        self.mul_comb = jax.jit(self.mul_comb)
        self.mul_comb4 = jax.jit(self.mul_comb4)
        self.double_mul_comb = jax.jit(self.double_mul_comb)
        self.msm = jax.jit(self.msm)
        self.msm_ladder = jax.jit(self.msm_ladder)
        self.msm_shared = jax.jit(self.msm_shared)
        self.to_affine = jax.jit(self.to_affine)
        self.eq = jax.jit(self.eq)
        self.is_identity = jax.jit(self.is_identity)
        # mixed-add comb path (Edwards subclasses only)
        for name in (
            "comb_table_mixed", "add_mixed",
            "mul_comb_mixed", "double_mul_comb_mixed",
        ):
            if hasattr(self, name):
                setattr(self, name, jax.jit(getattr(self, name)))

    # -- subclass interface -------------------------------------------------
    def add(self, P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def dbl(self, P: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def neg(self, P: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def identity_coords(self) -> np.ndarray:
        raise NotImplementedError

    # -- generic ------------------------------------------------------------
    def identity(self, batch_shape: tuple = ()) -> jnp.ndarray:
        ident = jnp.asarray(self.identity_coords())
        return jnp.broadcast_to(ident, batch_shape + ident.shape)

    def select(self, mask: jnp.ndarray, P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        """mask ? P : Q, mask shaped like the batch."""
        return jnp.where(mask[..., None, None], P, Q)

    def table(self, P: jnp.ndarray) -> jnp.ndarray:
        """[..., 16, C, L] window table of small multiples 0..15."""

        def step(acc, _):
            nxt = self.add(acc, P)
            return nxt, nxt

        ident = self.identity(P.shape[:-2])
        _, rest = jax.lax.scan(step, ident, None, length=TABLE - 1)
        # rest: [15, ..., C, L] -> [..., 15, C, L]
        rest = jnp.moveaxis(rest, 0, -3)
        return jnp.concatenate([ident[..., None, :, :], rest], axis=-3)

    def _gather(self, table: jnp.ndarray, digit: jnp.ndarray) -> jnp.ndarray:
        """table [..., 16, C, L], digit [...] -> [..., C, L]; table batch
        dims broadcast against the digit batch.

        One-hot multiply-reduce: mask the window axis with ``digit == k``
        and sum it away.  XLA fuses the broadcast-compare/select into the
        reduction, so the [batch, 16, C, L] operand is never materialized
        (a dynamic gather over a broadcast table would materialize it: GBs
        for a shared table against an [N, 80] digit batch) and the table is
        read ONCE - the previous 15-step select chain re-read the
        accumulator 15 times, ~3 GB of extra traffic per gather at the
        prover's [N=16, 80, 26] commit-stack shape.  Exact: one term per
        sum is nonzero."""
        oh = digit[..., None, None, None] == jax.lax.broadcasted_iota(
            jnp.int32, (TABLE, 1, 1), 0
        )
        return jnp.sum(jnp.where(oh, table, 0.0), axis=-3)

    def scalar_mul_table(self, tab: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        """Windowed multiply from a precomputed table [..., 16, C, L] and
        MSB-first digits [..., D]; table batch dims broadcast against the
        digit batch (one table can serve many scalars - e.g. the per-proof
        base R across all 80 exp rounds, or a static Pedersen base)."""
        batch = jnp.broadcast_shapes(tab.shape[:-3], digits.shape[:-1])

        def step(acc, digit):
            acc = self.dbl(self.dbl(self.dbl(self.dbl(acc))))
            return self.add(acc, self._gather(tab, digit)), None

        acc, _ = jax.lax.scan(
            step, self.identity(batch), jnp.moveaxis(digits, -1, 0)
        )
        return acc

    def scalar_mul(self, P: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        """P * s with s given as MSB-first 4-bit digits [..., D]
        (group.ts:133-152 windowing, batched)."""
        return self.scalar_mul_table(self.table(P), digits)

    # -- per-point 4-bit comb (dynamic base, many scalars) -----------------
    #
    # When MANY scalars multiply the SAME dynamic base (the prover's 80
    # exp rounds T_i = alpha_i * R share one R per instance), the 4-bit
    # window scan pays 256 doublings per SCALAR lane.  A per-base comb
    # table T4[j][d] = d * 16^(63-j) * B costs ~252 doublings + ~960 adds
    # ONCE per base, after which each multiply is 64 gather-adds and zero
    # doublings: ~3.5x fewer point ops at 80 scalars per base.

    def comb4_table(self, P: jnp.ndarray) -> jnp.ndarray:
        """[..., 64, 16, C, L]: entry [j][d] = d * 16^(63-j) * P
        (position axis MSB-first, matching ``F32Field.digits4``)."""

        def dbl4(p, _):
            for _ in range(4):
                p = self.dbl(p)
            return p, p

        _, rest = jax.lax.scan(dbl4, P, None, length=NDIGITS_256 - 1)
        rest = jnp.moveaxis(rest, 0, -3)  # [..., 63, C, L]
        bases = jnp.concatenate([P[..., None, :, :], rest], axis=-3)
        bases = jnp.flip(bases, axis=-3)  # MSB-first positions
        tab = jnp.stack(
            [self.identity(bases.shape[:-2]), bases], axis=-3
        )  # [..., 64, 2, C, L]
        while tab.shape[-3] < TABLE:
            k = tab.shape[-3]
            mk = self.dbl(tab[..., k // 2, :, :]) if k > 1 else bases
            tab = jnp.concatenate(
                [tab, self.add(tab, mk[..., None, :, :])], axis=-3
            )
        return tab

    def mul_comb4(self, tab: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        """Multiply from a :meth:`comb4_table`: tab [..., 64, 16, C, L],
        digits [..., B, 64] MSB-first nibbles -> [..., B, C, L].  64
        gather-adds per scalar, zero doublings; the table's batch dims
        broadcast against the scalar batch B."""
        batch = jnp.broadcast_shapes(
            tab.shape[:-4] + (1,), digits.shape[:-1]
        )

        def step(acc, xs):
            tab_j, d_j = xs  # [..., 16, C, L], [..., B]
            return self.add(acc, self._gather(tab_j[..., None, :, :, :], d_j)), None

        acc, _ = jax.lax.scan(
            step,
            self.identity(batch),
            (jnp.moveaxis(tab, -4, 0), jnp.moveaxis(digits, -1, 0)),
        )
        return acc

    def double_mul_tables(
        self,
        tp: jnp.ndarray,
        dP: jnp.ndarray,
        tq: jnp.ndarray,
        dQ: jnp.ndarray,
    ) -> jnp.ndarray:
        """dP*P + dQ*Q from precomputed tables, shared doublings
        (Shamir; group.ts:97-132)."""
        batch = jnp.broadcast_shapes(
            tp.shape[:-3], tq.shape[:-3], dP.shape[:-1], dQ.shape[:-1]
        )

        def step(acc, ds):
            dp, dq = ds
            acc = self.dbl(self.dbl(self.dbl(self.dbl(acc))))
            acc = self.add(acc, self._gather(tp, dp))
            return self.add(acc, self._gather(tq, dq)), None

        acc, _ = jax.lax.scan(
            step,
            self.identity(batch),
            (jnp.moveaxis(dP, -1, 0), jnp.moveaxis(dQ, -1, 0)),
        )
        return acc

    def double_mul(
        self,
        P: jnp.ndarray,
        dP: jnp.ndarray,
        Q: jnp.ndarray,
        dQ: jnp.ndarray,
    ) -> jnp.ndarray:
        """dP*P + dQ*Q with shared doublings (Shamir; group.ts:97-132)."""
        return self.double_mul_tables(self.table(P), dP, self.table(Q), dQ)

    def sum_reduce(self, P: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Tree-sum of points along an axis: log-depth, exactly n-1 adds.
        Odd widths carry their last element to the next level instead of
        padding to a power of two (identity-padding a 760-lane MSM reduce
        to 1024 cost 35% extra adds per column; complete formulas need no
        masking either way)."""
        P = jnp.moveaxis(P, axis, 0)
        if P.shape[0] == 0:
            return self.identity(P.shape[1:-2])
        while P.shape[0] > 1:
            h = P.shape[0] // 2
            rest = P[2 * h :]  # 0 or 1 carried element
            P = jnp.concatenate([self.add(P[:h], P[h : 2 * h]), rest], axis=0)
        return P[0]

    def msm(self, points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        """sum_i s_i * P_i: per-term windowed multiplies in parallel lanes,
        then one tree reduction.  points [N, C, L], digits [N, D]."""
        return self.sum_reduce(self.scalar_mul(points, digits), axis=0)

    # -- comb fixed-base path ------------------------------------------------
    #
    # For a STATIC base (the Pedersen g/h, the group generator) the 4-bit
    # window scan pays 256 doublings + 64 additions per scalar.  The comb
    # method precomputes T[j][d] = d * 2^(8j) * B once per base, after
    # which one multiply is 32 table gathers + 31 additions and ZERO
    # doublings - ~6x fewer point ops, and the gathers are one-hot MXU
    # dots.  This is what makes the prover's [N, 80, 26] Pedersen commit
    # stack (the round-3 bench's 60% stage) affordable.

    COMB_WBITS = 8
    COMB_WINDOWS = 32  # 256-bit scalars

    def comb_table(self, P: jnp.ndarray) -> jnp.ndarray:
        """[32, 256, C, L] comb table T[j][d] = d * 2^(8j) * P, built ON
        DEVICE from one packed point: 31x8 doublings for the window bases,
        then multiples 0..255 by index-set doubling (m[d + k] = m[d] + m[k]
        for k = 1, 2, 4, ..., 128: 8 batched add rounds)."""
        w, D = self.COMB_WBITS, self.COMB_WINDOWS

        def dbl_w(p, _):
            for _ in range(w):
                p = self.dbl(p)
            return p, p

        _, rest = jax.lax.scan(dbl_w, P, None, length=D - 1)
        bases = jnp.concatenate([P[None], rest], axis=0)  # [D, C, L]
        tab = jnp.stack([self.identity((D,)), bases], axis=1)  # [D, 2, C, L]
        while tab.shape[1] < (1 << w):
            k = tab.shape[1]
            mk = self.dbl(tab[:, k // 2]) if k > 1 else bases  # m[k]
            tab = jnp.concatenate(
                [tab, self.add(tab, mk[:, None])], axis=1
            )
        return tab

    def mul_comb(self, comb: jnp.ndarray, d8: jnp.ndarray) -> jnp.ndarray:
        """Fixed-base multiply from a comb table: comb [D, 256, C, L]
        (or a concatenation of several bases' tables for a multi-scalar
        fixed-base sum), d8 [..., D] LSB-first byte digits -> [..., C, L].
        One ``lax.scan`` over windows; each step is a one-hot MXU dot
        (exact: one f32 product per output, digits < 128) + one addition."""
        D = comb.shape[0]
        C, L = comb.shape[-2], comb.shape[-1]
        dcols = jnp.moveaxis(d8, -1, 0)  # [D, ...]
        batch = d8.shape[:-1]
        nb = 1 << self.COMB_WBITS
        comb_flat = comb.reshape(D, nb, C * L)

        def step(acc, xs):
            dj, tabj = xs  # dj [...], tabj [256, C*L]
            oh = (
                dj[..., None]
                == jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)[0]
            ).astype(jnp.float32)
            term = jnp.einsum(
                "...k,km->...m", oh, tabj,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(batch + (C, L))
            return self.add(acc, term), None

        acc, _ = jax.lax.scan(step, self.identity(batch), (dcols, comb_flat))
        return acc

    def double_mul_comb(
        self,
        comb_p: jnp.ndarray,
        dP8: jnp.ndarray,
        comb_q: jnp.ndarray,
        dQ8: jnp.ndarray,
    ) -> jnp.ndarray:
        """dP*P + dQ*Q for two STATIC bases: one comb scan over the
        concatenated window tables (the fixed-base analog of the Shamir
        double-mult; reference src/curves/group.ts:97-132)."""
        return self.mul_comb(
            jnp.concatenate([comb_p, comb_q], axis=0),
            jnp.concatenate([dP8, dQ8], axis=-1),
        )

    def msm_ladder(self, points: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
        """Batched-row MSM without window tables: per-term MSB-first
        double-and-add (256 masked steps), then a tree reduction over the
        term axis.  points [..., T, C, L], bits [..., T, 256] (MSB first)
        -> [..., C, L].

        Unlike :meth:`msm` this builds no [T, 16] tables, so whole proof
        batches fit in HBM ([N, T] term lanes in one dispatch) - the
        batched replacement for the reference's per-verification Bos-Coster
        heap (multimult.ts:61-145)."""
        bcols = jnp.moveaxis(bits, -1, 0)  # [256, ..., T]

        def step(acc, b):
            acc = self.dbl(acc)
            cand = self.add(acc, points)
            return self.select(b > 0, cand, acc), None

        acc, _ = jax.lax.scan(step, self.identity(points.shape[:-2]), bcols)
        return self.sum_reduce(acc, axis=-3)

    def msm_shared(self, points: jnp.ndarray, digits: jnp.ndarray) -> jnp.ndarray:
        """Straus (interleaved-window) MSM: sum_i s_i * P_i with the
        doublings shared across ALL terms.  points [..., T, C, L], digits
        [..., T, D] MSB-first 4-bit -> [..., C, L].

        Per digit column the accumulator (ONE point per MSM row, not one
        per term) is doubled 4x and the T gathered window multiples are
        tree-summed into it, so the whole MSM costs D*(4 dbl + T adds) +
        15*T table adds instead of the per-term ladder's T*(256 dbl + 256
        add): ~7x fewer point ops for T=256.  This is the batched,
        constant-shape replacement for the reference's Bos-Coster heap
        (multimult.ts:61-145), which shares doublings data-dependently.
        Costs a [..., T, 16, C, L] window table in HBM - callers chunk the
        batch when that exceeds budget (see protocol/batch_verify.py)."""
        tabs = self.table(points)  # [..., T, 16, C, L]
        batch = jnp.broadcast_shapes(points.shape[:-3], digits.shape[:-2])
        dcols = jnp.moveaxis(digits, -1, 0)  # [D, ..., T]

        def step(acc, d):
            acc = self.dbl(self.dbl(self.dbl(self.dbl(acc))))
            terms = self._gather(tabs, d)  # [..., T, C, L]
            return self.add(acc, self.sum_reduce(terms, axis=-3)), None

        acc, _ = jax.lax.scan(step, self.identity(batch), dcols)
        return acc

    def msm_pippenger(
        self, points: jnp.ndarray, scalars: list[int], window: int | None = None
    ) -> jnp.ndarray:
        """Single-row convenience wrapper over :meth:`msm_pippenger_rows`."""
        return self.msm_pippenger_rows(
            points[None], [list(scalars)], window
        )[0]

    def msm_pippenger_rows(
        self, points: jnp.ndarray, scalars_rows, window: int | None = None
    ) -> jnp.ndarray:
        """Pippenger bucket MSM over a BATCH of rows: out[i] = sum_t
        s[i,t] * P[i,t], points [N, T, C, L] on device, scalars as host
        ints (they always are: proof/relation scalars live on the host).
        The bucket-method replacement for the reference's Bos-Coster heap
        (multimult.ts:61-145) at large T, per SURVEY section 7.5.

        Delegates to the vectorized chunk-layout kernel in
        :mod:`zkecdsa_tpu.ops.msm_bucket` (round 5; the previous
        per-point scan fold + full-width segmented scan was measured
        10-100x behind Straus and documented a strawman - VERDICT r4
        weak #4).  Unlike :meth:`msm_shared` there is NO [T, 16, C, L]
        window table in HBM - the capacity limit that forces the batch
        verifier's chunker (protocol/batch_verify.py)."""
        from .msm_bucket import msm_bucket_rows

        return msm_bucket_rows(self, points, scalars_rows, window)

    def eq(self, P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        """Projective equality via cross-multiplication (batched)."""
        f = self.f
        x1, y1, z1 = P[..., 0, :], P[..., 1, :], P[..., -1, :]
        x2, y2, z2 = Q[..., 0, :], Q[..., 1, :], Q[..., -1, :]
        ex = f.equal(f.mul(x1, z2), f.mul(x2, z1))
        ey = f.equal(f.mul(y1, z2), f.mul(y2, z1))
        return ex & ey

    def is_identity(self, P: jnp.ndarray) -> jnp.ndarray:
        return self.eq(P, self.identity(P.shape[:-2]))

    def to_affine(self, P: jnp.ndarray):
        """Batch affine conversion: one Fermat inversion per batch via
        batch_inv.  Returns (x, y, is_infinity); infinity yields (0, 0)."""
        f = self.f
        z = P[..., -1, :]
        shape = z.shape
        zinv = f.batch_inv(z.reshape(-1, shape[-1])).reshape(shape)
        x = f.mul(P[..., 0, :], zinv)
        y = f.mul(P[..., 1, :], zinv)
        return x, y, f.is_zero(z)

    # -- host packing -------------------------------------------------------

    def pack_points(self, pts) -> np.ndarray:
        """Host curve points -> [N, C, L] float32 digits."""
        raise NotImplementedError

    def unpack_points(self, arr):
        """[N, C, L] -> list of host curve points."""
        raise NotImplementedError


class WeierOps(CurveOps):
    """Short Weierstrass, a = -3, homogeneous projective (X:Y:Z);
    identity (0:1:0).  RCB15 complete formulas (cf. weier.ts:133-230)."""

    NCOORD = 3

    def __init__(self, field: F32Field, b: int, group) -> None:
        super().__init__(field)
        # numpy, not a device array: closed-over device-array constants make
        # XLA treat every op using them as having a captured buffer operand,
        # which on this backend runs ~10^4x slower than an inlined literal
        # (and long enough to trip the device watchdog at scale).
        self.b = field.pack_scalar(b)
        self.group = group  # host group for unpack

    def identity_coords(self) -> np.ndarray:
        L = self.f.nlimbs
        out = np.zeros((3, L), dtype=np.float32)
        out[1] = self.f.pack_scalar(1)
        return out

    def add(self, P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        f, b = self.f, self.b
        x1, y1, z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        x2, y2, z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
        m0 = f.mul(x1, x2)
        m1 = f.mul(y1, y2)
        m2 = f.mul(z1, z2)
        sxy = f.sub(f.sub(f.mul(f.add(x1, y1), f.add(x2, y2)), m0), m1)
        syz = f.sub(f.sub(f.mul(f.add(y1, z1), f.add(y2, z2)), m1), m2)
        sxz = f.sub(f.sub(f.mul(f.add(x1, z1), f.add(x2, z2)), m0), m2)
        w = f.mul_small(f.sub(sxz, f.mul(b, m2)), 3)
        zc = f.sub(m1, w)
        xc = f.add(m1, w)
        v = f.mul_small(f.sub(f.sub(f.mul(b, sxz), f.mul_small(m2, 3)), m0), 3)
        u = f.mul_small(f.sub(m0, m2), 3)
        x3 = f.sub(f.mul(sxy, xc), f.mul(syz, v))
        y3 = f.add(f.mul(xc, zc), f.mul(u, v))
        z3 = f.add(f.mul(syz, zc), f.mul(sxy, u))
        return jnp.stack([x3, y3, z3], axis=-2)

    def dbl(self, P: jnp.ndarray) -> jnp.ndarray:
        f, b = self.f, self.b
        x, y, z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        xx = f.mul(x, x)
        yy = f.mul(y, y)
        zz = f.mul(z, z)
        xy2 = f.dbl(f.mul(x, y))
        xz2 = f.dbl(f.mul(x, z))
        yz2 = f.dbl(f.mul(y, z))
        w = f.mul_small(f.sub(f.mul(b, zz), xz2), 3)
        zc = f.sub(yy, w)
        xc = f.add(yy, w)
        v = f.mul_small(f.sub(f.sub(f.mul(b, xz2), f.mul_small(zz, 3)), xx), 3)
        u = f.mul_small(f.sub(xx, zz), 3)
        x3 = f.sub(f.mul(xy2, zc), f.mul(yz2, v))
        y3 = f.add(f.mul(xc, zc), f.mul(u, v))
        z3 = f.mul_small(f.mul(yz2, yy), 4)
        return jnp.stack([x3, y3, z3], axis=-2)

    def neg(self, P: jnp.ndarray) -> jnp.ndarray:
        y = self.f.neg(P[..., 1, :])
        return jnp.concatenate(
            [P[..., :1, :], y[..., None, :], P[..., 2:, :]], axis=-2
        )

    def pack_points(self, pts) -> np.ndarray:
        xs, ys, zs = [], [], []
        for pt in pts:
            xs.append(pt.x)
            ys.append(pt.y)
            zs.append(pt.z)
        return np.stack(
            [self.f.pack(xs), self.f.pack(ys), self.f.pack(zs)], axis=1
        )

    def unpack_points(self, arr):
        from ..curves.weier import WeierstrassPoint

        a = np.asarray(arr).reshape(-1, 3, self.f.nlimbs)
        xs = self.f.unpack(a[:, 0])
        ys = self.f.unpack(a[:, 1])
        zs = self.f.unpack(a[:, 2])
        return [
            WeierstrassPoint(self.group, x, y, z) for x, y, z in zip(xs, ys, zs)
        ]


class EdwardsOps(CurveOps):
    """Twisted Edwards extended coordinates (X:Y:T:Z); identity (0:1:0:1).
    HWCD08 unified formulas (cf. edwards.ts:141-183)."""

    NCOORD = 4

    def __init__(self, field: F32Field, a: int, d: int, group) -> None:
        super().__init__(field)
        # numpy literals, not device arrays (see WeierOps.__init__).
        self.a = field.pack_scalar(a)
        self.d = field.pack_scalar(d)
        self.group = group

    def identity_coords(self) -> np.ndarray:
        L = self.f.nlimbs
        out = np.zeros((4, L), dtype=np.float32)
        out[1] = self.f.pack_scalar(1)
        out[3] = self.f.pack_scalar(1)
        return out

    def add(self, P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        f = self.f
        x1, y1, t1, z1 = (P[..., i, :] for i in range(4))
        x2, y2, t2, z2 = (Q[..., i, :] for i in range(4))
        A = f.mul(x1, x2)
        B = f.mul(y1, y2)
        C = f.mul(self.d, f.mul(t1, t2))
        D = f.mul(z1, z2)
        E = f.sub(f.sub(f.mul(f.add(x1, y1), f.add(x2, y2)), A), B)
        F = f.sub(D, C)
        G = f.add(D, C)
        H = f.sub(B, f.mul(self.a, A))
        return jnp.stack(
            [f.mul(E, F), f.mul(G, H), f.mul(E, H), f.mul(F, G)], axis=-2
        )

    def dbl(self, P: jnp.ndarray) -> jnp.ndarray:
        f = self.f
        x, y, z = P[..., 0, :], P[..., 1, :], P[..., 3, :]
        A = f.mul(x, x)
        B = f.mul(y, y)
        C = f.dbl(f.mul(z, z))
        D = f.mul(self.a, A)
        xy = f.add(x, y)
        E = f.sub(f.sub(f.mul(xy, xy), A), B)
        G = f.add(D, B)
        F = f.sub(G, C)
        H = f.sub(D, B)
        return jnp.stack(
            [f.mul(E, F), f.mul(G, H), f.mul(E, H), f.mul(F, G)], axis=-2
        )

    def neg(self, P: jnp.ndarray) -> jnp.ndarray:
        f = self.f
        x = f.neg(P[..., 0, :])
        t = f.neg(P[..., 2, :])
        return jnp.stack(
            [x, P[..., 1, :], t, P[..., 3, :]], axis=-2
        )

    def pack_points(self, pts) -> np.ndarray:
        xs, ys, ts, zs = [], [], [], []
        for pt in pts:
            xs.append(pt.x)
            ys.append(pt.y)
            ts.append(pt.t)
            zs.append(pt.z)
        return np.stack(
            [self.f.pack(xs), self.f.pack(ys), self.f.pack(ts), self.f.pack(zs)],
            axis=1,
        )

    def unpack_points(self, arr):
        from ..curves.edwards import TEdwardsPoint

        a = np.asarray(arr).reshape(-1, 4, self.f.nlimbs)
        xs = self.f.unpack(a[:, 0])
        ys = self.f.unpack(a[:, 1])
        ts = self.f.unpack(a[:, 2])
        zs = self.f.unpack(a[:, 3])
        return [
            TEdwardsPoint(self.group, x, y, t, z)
            for x, y, t, z in zip(xs, ys, ts, zs)
        ]

    # -- mixed-addition comb path (Edwards only) ---------------------------
    #
    # A comb table base is STATIC, so its entries can be stored affine
    # (Z2 = 1) with the per-entry products d*T2 and a*X2 and the sum
    # X2 + Y2 precomputed: the unified add then costs 9 field muls
    # instead of 11 (C = T1 * (d*T2) needs no d mul, D = Z1 needs no
    # Z mul, H = B - X1*(a*X2) needs no a mul).  ~18% off every comb
    # window step - the prover's Pedersen commit stacks are the single
    # largest device stage (BASELINE.md round-4 breakdown).

    MIXED_NC = 5  # rows: X2, Y2, X2+Y2, d*T2, a*X2

    def comb_table_mixed(self, P: jnp.ndarray) -> jnp.ndarray:
        """[D, 256, 5, L] mixed-add comb table: the extended comb entries
        converted to affine in ONE batch inversion, plus the precomputed
        add_mixed rows.  The d=0 entries are the affine identity (0, 1)
        (extended identity has Z=1, so the batch inversion is benign) and
        add_mixed degrades to a projective rescale on them - completeness
        is preserved."""
        f = self.f
        ext = self.comb_table(P)  # [D, 256, 4, L]
        D, nb = ext.shape[0], ext.shape[1]
        x, y, _ = self.to_affine(ext.reshape(D * nb, 4, f.nlimbs))
        t = f.mul(x, y)
        rows = jnp.stack(
            [
                x, y, f.add(x, y),
                f.mul(jnp.asarray(self.d), t),
                f.mul(jnp.asarray(self.a), x),
            ],
            axis=-2,
        )
        return rows.reshape(D, nb, self.MIXED_NC, f.nlimbs)

    def add_mixed(self, P: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
        """P (extended [..., 4, L]) + T (mixed table rows [..., 5, L]):
        the Z2=1 unified add with precomputed d*T2 / a*X2 / X2+Y2."""
        f = self.f
        x1, y1, t1, z1 = (P[..., i, :] for i in range(4))
        tx, ty, txy, tdt, tax = (T[..., i, :] for i in range(5))
        A = f.mul(x1, tx)
        B = f.mul(y1, ty)
        C = f.mul(t1, tdt)
        E = f.sub(f.sub(f.mul(f.add(x1, y1), txy), A), B)
        F = f.sub(z1, C)
        G = f.add(z1, C)
        H = f.sub(B, f.mul(x1, tax))
        return jnp.stack(
            [f.mul(E, F), f.mul(G, H), f.mul(E, H), f.mul(F, G)], axis=-2
        )

    def mul_comb_mixed(self, comb: jnp.ndarray, d8: jnp.ndarray) -> jnp.ndarray:
        """Fixed-base multiply from a MIXED comb table [D, 256, 5, L]
        (or several bases' tables concatenated along D); same scan shape
        as :meth:`CurveOps.mul_comb`, add_mixed instead of add."""
        D = comb.shape[0]
        NC, L = comb.shape[-2], comb.shape[-1]
        dcols = jnp.moveaxis(d8, -1, 0)  # [D, ...]
        batch = d8.shape[:-1]
        nb = comb.shape[1]
        comb_flat = comb.reshape(D, nb, NC * L)

        def step(acc, xs):
            dj, tabj = xs
            oh = (
                dj[..., None]
                == jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)[0]
            ).astype(jnp.float32)
            term = jnp.einsum(
                "...k,km->...m", oh, tabj,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(batch + (NC, L))
            return self.add_mixed(acc, term), None

        acc, _ = jax.lax.scan(step, self.identity(batch), (dcols, comb_flat))
        return acc

    def double_mul_comb_mixed(
        self,
        comb_p: jnp.ndarray,
        dP8: jnp.ndarray,
        comb_q: jnp.ndarray,
        dQ8: jnp.ndarray,
    ) -> jnp.ndarray:
        """dP*P + dQ*Q for two static bases on the mixed comb path."""
        return self.mul_comb_mixed(
            jnp.concatenate([comb_p, comb_q], axis=0),
            jnp.concatenate([dP8, dQ8], axis=-1),
        )


def _make_ops():
    from ..curves import instances as inst

    p256_ops = WeierOps(P256_P, inst.p256.b, inst.p256)
    tom_ops = EdwardsOps(
        TOM_P, inst.tomEdwards256.a, inst.tomEdwards256.d, inst.tomEdwards256
    )
    war_ops = WeierOps(WAR_P, inst.war256.b, inst.war256)
    return p256_ops, tom_ops, war_ops


p256_ops, tom_ops, war_ops = _make_ops()
