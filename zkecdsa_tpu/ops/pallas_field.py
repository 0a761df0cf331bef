"""Pallas-fused field kernels (SURVEY section 7.1 "Pallas kernels second
for speed" - the round-3 prototype deciding whether hand-fused kernels beat
the XLA-fused f32 engine).

The hypothesis: ``F32Field.mul`` lowers to outer-product -> one-hot
``dot_general`` -> fold/carry rounds.  Under plain XLA the [B, W*W] outer
product that feeds the MXU dot is materialized in HBM for large B (26 MB at
B=4096), so each multiply pays ~3 HBM round-trips; a whole curve addition
chains ~12 such multiplies.  A Pallas kernel tiles the batch into
VMEM-resident blocks: the convolutions and every fold/carry round stay
on-chip - one HBM read per operand, one write per result.

Mosaic cannot lower three shapes the engine's natural trace produces:
scatter-add (since rewritten out of the engine itself), the outer-product
[.., W, W] -> [.., W*W] flatten, and lane-dimension concatenation with
mismatched offsets (every carry round widens the digit axis by one).  The
kernels therefore run the SAME bound-tracked algorithm on a constant
128-lane digit axis (``_FixedField``): carries shift via ``pltpu.roll``
(wrap-safe - the top lanes are provably zero), the convolution is W shifted
multiply-adds, and every fold is ONE matmul with a host-built [128, 128]
matrix M = [[I_L; 0], [RED; 0]].  Identical integer math (same bound
assertions, all partial sums below 2^24); tests/test_pallas_field.py pins
bit-exactness against the engine.

Measurement on the chip (tools/pallas_microbench.py) decides adoption; the
result is recorded in BASELINE.md.
"""

from __future__ import annotations

import copy
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve_ops import EdwardsOps, WeierOps
from .f32field import BASE, F32_EXACT, INPUT_BOUND, STORED_BOUND, F32Field

__all__ = ["pallas_mul", "pallas_ec_add", "WK"]

WK = 128  # kernel lane width (one f32 tile)
_HI = jax.lax.Precision.HIGHEST


def _fold_matrix(field: F32Field) -> np.ndarray:
    """[WK, WK] fold-at-L matrix: row j < L keeps digit j; row L+t folds
    via RED[t] = 2^(7(L+t)) mod p; rows beyond the red table are
    unreachable (active width never exceeds L + nred)."""
    L = field.nlimbs
    red = np.asarray(field.red)  # [nred, L]
    M = np.zeros((WK, WK), np.float32)
    M[:L, :L] = np.eye(L, dtype=np.float32)
    M[L : L + red.shape[0], :L] = red
    return M


class _FixedField:
    """The engine's bound-tracked modular arithmetic on a constant 128-lane
    digit axis, built from Mosaic-lowerable ops only.  API contract matches
    ``F32Field``: public ops accept digit bounds up to INPUT_BOUND and
    return the storage invariant (digits <= STORED_BOUND, active width L).
    ``M`` (fold matrix) and ``padp`` arrive as traced kernel inputs."""

    def __init__(self, field: F32Field, M: jnp.ndarray, padp: jnp.ndarray):
        self.field = field
        self.L = field.nlimbs
        self.M = M
        self.padp_w = padp  # [WK], lanes >= L zero

    # -- bound-tracked primitives -------------------------------------

    @staticmethod
    def _active(b: list[int]) -> int:
        return max(i for i, v in enumerate(b) if v > 0) + 1

    @staticmethod
    def _carry(c: jnp.ndarray, b: list[int]):
        assert b[WK - 1] < BASE, "top lane must stay empty for wrap-safe roll"
        f = jnp.floor(c * (1.0 / BASE))
        d = c - f * float(BASE)
        out = d + pltpu.roll(f, 1, axis=f.ndim - 1)
        nb = [min(b[0], BASE - 1)]
        for i in range(1, WK):
            nb.append(min(b[i], BASE - 1) + b[i - 1] // BASE)
        return out, nb

    def _reduce(self, c: jnp.ndarray, b: list[int]) -> jnp.ndarray:
        L = self.L
        nred = np.asarray(self.field.red).shape[0]
        for _ in range(64):
            act = self._active(b)
            if act <= L and max(b) <= STORED_BOUND:
                return c
            if act > L:
                spill = sum(b[L:])
                fold_res = max(b[:L]) + spill * (BASE - 1)
                if fold_res < F32_EXACT and (
                    fold_res <= STORED_BOUND or max(b) <= 192
                ):
                    assert act - L <= nred
                    c = jnp.einsum("...j,jl->...l", c, self.M, precision=_HI)
                    b = [min(v + spill * (BASE - 1), fold_res) for v in b[:L]]
                    b = b + [0] * (WK - L)
                    continue
            c, b = self._carry(c, b)
        raise AssertionError(f"fixed reduce did not converge: {b}")

    def _in_bounds(self) -> list[int]:
        return [INPUT_BOUND if i < self.L else 0 for i in range(WK)]

    # -- F32Field-compatible ops ---------------------------------------

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        ba, bb = self._in_bounds(), self._in_bounds()
        while (
            2 * max(self._active(ba), self._active(bb)) + 1
        ) * max(ba) * max(bb) >= F32_EXACT:
            a, ba = self._carry(a, ba)
            b, bb = self._carry(b, bb)
        a, b = jnp.broadcast_arrays(a, b)
        wa, wb = self._active(ba), self._active(bb)
        mba, mbb = max(ba), max(bb)
        assert wa + wb <= WK, "conv overflows the lane width"
        cols = None
        for i in range(wa):
            t = a[..., i : i + 1] * pltpu.roll(b, i, axis=b.ndim - 1)
            cols = t if cols is None else cols + t
        cb = [
            min(k + 1, wa, wb, wa + wb - 1 - k) * mba * mbb
            if k < wa + wb - 1
            else 0
            for k in range(WK)
        ]
        return self._reduce(cols, cb)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return self._reduce(a + b, [2 * v for v in self._in_bounds()])

    def add_lazy(self, a, b):
        return a + b

    def sub(self, a, b):
        d = a + (self.padp_w - b)
        return self._reduce(d, [2 * v for v in self._in_bounds()])

    def neg(self, a):
        return self._reduce(self.padp_w - a, self._in_bounds())

    def dbl(self, a):
        return self._reduce(a + a, [2 * v for v in self._in_bounds()])

    def mul_small(self, a, k: int):
        assert 0 <= k <= 64
        if k == 0:
            return jnp.zeros_like(a)
        return self._reduce(a * float(k), [k * v for v in self._in_bounds()])


def _pad_lanes(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, WK - x.shape[-1])])


def _grid_1d(B: int, block: int) -> int:
    if B % block != 0:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    return B // block


def _repl_spec(shape):
    """A grid-invariant (replicated) VMEM block for a constant table."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def pallas_mul(field: F32Field, block: int = 256, interpret: bool = False):
    """Fused modular multiply: [B, L] x [B, L] -> [B, L], batch tiled into
    VMEM blocks of ``block`` rows (the digit axis is padded to one 128-wide
    lane tile).  Bit-exact vs ``jax.jit(field.mul)``."""
    L = field.nlimbs
    M_np = _fold_matrix(field)

    def kernel(a_ref, b_ref, m_ref, o_ref):
        # padp stays 2D: Mosaic cannot roll/operate on 1D vectors
        ff = _FixedField(field, m_ref[:], jnp.zeros((1, WK), jnp.float32))
        o_ref[:] = ff.mul(a_ref[:], b_ref[:])

    @jax.jit
    def fn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        B = a.shape[0]
        grid = _grid_1d(B, block)
        spec = pl.BlockSpec((block, WK), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec, spec, _repl_spec((WK, WK))],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, WK), jnp.float32),
            interpret=interpret,
        )(_pad_lanes(a), _pad_lanes(b), jnp.asarray(M_np))
        return out[..., :L]

    return fn


@functools.lru_cache(maxsize=None)
def pallas_ec_add(ops, block: int = 128, interpret: bool = False):
    """Fused complete point addition: [B, C, L] x [B, C, L] -> [B, C, L].
    One kernel holds all ~12 field multiplies of the RCB15/HWCD08 formulas
    VMEM-resident.  ``ops`` is a CurveOps instance; the kernel calls the
    class's unjitted ``add`` with a trace-time copy whose field is the
    fixed-width engine and whose curve coefficients come from kernel
    inputs."""
    C, L = ops.NCOORD, ops.f.nlimbs
    add_alg = type(ops).add  # unbound: bypass the jax.jit wrapper
    M_np = _fold_matrix(ops.f)
    padp_np = _pad_lanes(np.asarray(ops.f.padp)[None])[0]
    if isinstance(ops, EdwardsOps):
        coef_np = np.stack([ops.a, ops.d])
    elif isinstance(ops, WeierOps):
        coef_np = np.stack([ops.b])
    else:  # pragma: no cover - new curve families declare their constants
        raise TypeError(f"unsupported CurveOps {type(ops).__name__}")
    coef_np = np.asarray(_pad_lanes(coef_np))

    def kernel(p_ref, q_ref, m_ref, padp_ref, coef_ref, o_ref):
        ops2 = copy.copy(ops)
        # all constants stay 2D [1, WK]: Mosaic has no 1D vector support
        ops2.f = _FixedField(ops.f, m_ref[:], padp_ref[:])
        if isinstance(ops, EdwardsOps):
            ops2.a, ops2.d = coef_ref[0:1], coef_ref[1:2]
        else:
            ops2.b = coef_ref[0:1]
        o_ref[:] = add_alg(ops2, p_ref[:], q_ref[:])

    @jax.jit
    def fn(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        B = P.shape[0]
        grid = _grid_1d(B, block)
        spec = pl.BlockSpec(
            (block, C, WK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                spec,
                spec,
                _repl_spec((WK, WK)),
                _repl_spec((1, WK)),
                _repl_spec(coef_np.shape),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, C, WK), jnp.float32),
            interpret=interpret,
        )(
            _pad_lanes(P),
            _pad_lanes(Q),
            jnp.asarray(M_np),
            jnp.asarray(padp_np)[None],
            jnp.asarray(coef_np),
        )
        return out[..., :L]

    return fn
