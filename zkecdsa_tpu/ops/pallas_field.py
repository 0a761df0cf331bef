"""Pallas-fused field kernels (SURVEY section 7.1 "Pallas kernels second
for speed" - the round-3 prototype deciding whether hand-fused kernels beat
the XLA-fused f32 engine).

The hypothesis: ``F32Field.mul`` lowers to outer-product -> one-hot
``dot_general`` -> fold/carry rounds.  Under plain XLA the [B, W*W] outer
product that feeds the MXU dot is materialized in HBM for large B (26 MB at
B=4096), so each multiply pays ~3 HBM round-trips; a whole curve addition
chains ~12 such multiplies.  A Pallas kernel tiles the batch into
VMEM-resident blocks: the outer products, convolution dots and every
fold/carry round stay on-chip - one HBM read per operand, one write per
result.

Because the field engine is pure traced jnp (trace-time Python bound
tracking, no data-dependent control flow), the kernel body simply CALLS
the engine: ``F32Field.mul`` / the curve group law trace straight into the
kernel and Mosaic keeps every intermediate in VMEM.  The same code is its
own reference implementation - correctness is identical tracing, only
memory placement changes.  The one wrinkle: Pallas forbids captured
non-scalar constants, so the engine's numpy tables (fold rows ``red``,
the PADP subtraction offset, curve coefficients) are passed as kernel
inputs and spliced into a trace-time shallow copy of the field/ops object.

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
from .f32field import F32Field

__all__ = ["pallas_mul", "pallas_ec_add"]


def _traced_field(field: F32Field, red: jnp.ndarray, padp: jnp.ndarray) -> F32Field:
    """Trace-time view of ``field`` whose constant tables are traced arrays
    (kernel inputs) instead of numpy literals.  Static slices like
    ``red[:rows]`` keep working; ``jnp.asarray`` on a tracer is a no-op."""
    f2 = copy.copy(field)
    f2.red = red
    f2.padp = padp
    return f2


def _grid_1d(B: int, block: int) -> int:
    if B % block != 0:
        raise ValueError(f"batch {B} must be a multiple of block {block}")
    return B // block


def _repl_spec(shape):
    """A grid-invariant (replicated) VMEM block for a constant table."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def pallas_mul(field: F32Field, block: int = 512, interpret: bool = False):
    """Fused modular multiply: [B, L] x [B, L] -> [B, L], batch tiled into
    VMEM blocks of ``block`` rows.  Semantically identical to
    ``jax.jit(field.mul)`` (it traces the same code)."""
    L = field.nlimbs
    red_np = np.asarray(field.red)

    def kernel(a_ref, b_ref, red_ref, o_ref):
        f2 = _traced_field(field, red_ref[:], red_ref[0])  # padp unused in mul
        o_ref[:] = f2.mul(a_ref[:], b_ref[:])

    @jax.jit
    def fn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        B = a.shape[0]
        grid = _grid_1d(B, block)
        spec = pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[spec, spec, _repl_spec(red_np.shape)],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
            interpret=interpret,
        )(a, b, jnp.asarray(red_np))

    return fn


@functools.lru_cache(maxsize=None)
def pallas_ec_add(ops, block: int = 256, interpret: bool = False):
    """Fused complete point addition: [B, C, L] x [B, C, L] -> [B, C, L].
    One kernel holds all ~12 field multiplies of the RCB15/HWCD08 formulas
    VMEM-resident.  ``ops`` is a CurveOps instance; the kernel calls the
    class's unjitted ``add`` with a trace-time copy whose field tables and
    curve coefficients come from kernel inputs."""
    C, L = ops.NCOORD, ops.f.nlimbs
    add_alg = type(ops).add  # unbound: bypass the jax.jit wrapper
    red_np = np.asarray(ops.f.red)
    padp_np = np.asarray(ops.f.padp)
    if isinstance(ops, EdwardsOps):
        coef_np = np.stack([ops.a, ops.d])
    elif isinstance(ops, WeierOps):
        coef_np = np.stack([ops.b])
    else:  # pragma: no cover - new curve families declare their constants
        raise TypeError(f"unsupported CurveOps {type(ops).__name__}")

    def kernel(p_ref, q_ref, red_ref, padp_ref, coef_ref, o_ref):
        ops2 = copy.copy(ops)
        ops2.f = _traced_field(ops.f, red_ref[:], padp_ref[0])
        if isinstance(ops, EdwardsOps):
            ops2.a, ops2.d = coef_ref[0], coef_ref[1]
        else:
            ops2.b = coef_ref[0]
        o_ref[:] = add_alg(ops2, p_ref[:], q_ref[:])

    @jax.jit
    def fn(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
        B = P.shape[0]
        grid = _grid_1d(B, block)
        spec = pl.BlockSpec(
            (block, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                spec,
                spec,
                _repl_spec(red_np.shape),
                _repl_spec((1, L)),
                _repl_spec(coef_np.shape),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, C, L), jnp.float32),
            interpret=interpret,
        )(P, Q, jnp.asarray(red_np), jnp.asarray(padp_np)[None], jnp.asarray(coef_np))

    return fn
