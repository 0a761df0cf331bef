"""Pallas TPU kernels for Montgomery field arithmetic.

The jnp limb path (ops/limbs.py) materializes every intermediate to HBM
and serializes carry chains as host-visible scans; this kernel keeps the
whole CIOS multiply VMEM/register-resident per block.

Layout: limbs on sublanes, batch on lanes - a [L, B] block with B a
multiple of 128 puts each limb row in vector lanes, so the schoolbook
product is L broadcast-multiplies of [1, B] x [L, B] and carries are plain
row arithmetic.  Everything is branchless straight-line code, unrolled at
trace time (L is static).

Used through :func:`mont_mul` which handles transposes/padding, and
selectable as the FieldCtx multiply backend via
``zkecdsa_tpu.ops.limbs.set_mul_backend("pallas")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..limbs import BASE_BITS, MASK, FieldCtx

__all__ = ["mont_mul", "make_mont_mul_kernel"]

BLOCK_B = 512  # lanes per grid step


def _kernel_body(ctx: FieldCtx, a_ref, b_ref, o_ref):
    L = ctx.nlimbs
    a = a_ref[...].astype(jnp.uint32)  # [L, B]
    b = b_ref[...].astype(jnp.uint32)
    B = a.shape[1]
    # modulus limbs as scalar constants (pallas kernels cannot capture
    # device arrays; scalars fold into the instruction stream)
    pj = [jnp.uint32(int(v)) for v in ctx.p_limbs]
    n0 = jnp.uint32(ctx.n0)

    # ---- full product, column-accumulated into 2L+1 rows ----
    t = [jnp.zeros((B,), jnp.uint32) for _ in range(2 * L + 1)]
    for i in range(L):
        prod = a[i, :][None, :] * b  # [L, B], exact in u32
        lo = prod & MASK
        hi = prod >> BASE_BITS
        for j in range(L):
            t[i + j] = t[i + j] + lo[j, :]
            t[i + j + 1] = t[i + j + 1] + hi[j, :]

    # ---- CIOS reduction: L rounds, running carry ----
    carry = jnp.zeros((B,), jnp.uint32)
    for i in range(L):
        ti = t[i] + carry
        m = (ti * n0) & MASK
        mp0 = m * pj[0]
        carry = ((ti + (mp0 & MASK)) >> BASE_BITS) + (mp0 >> BASE_BITS)
        for j in range(1, L):
            mp = m * pj[j]
            t[i + j] = t[i + j] + (mp & MASK)
            t[i + j + 1] = t[i + j + 1] + (mp >> BASE_BITS)

    # result rows L..2L (L+1 digits) + carry
    r = [t[L + i] for i in range(L + 1)]
    r[0] = r[0] + carry
    # normalize
    c = jnp.zeros((B,), jnp.uint32)
    for i in range(L + 1):
        v = r[i] + c
        r[i] = v & MASK
        c = v >> BASE_BITS
    # conditional subtract p (result < 2p)
    borrow = jnp.zeros((B,), jnp.int32)
    sub = []
    for i in range(L + 1):
        pi = jnp.int32(int(ctx.p_limbs[i]) if i < L else 0)
        d = r[i].astype(jnp.int32) - pi + borrow
        sub.append(d & MASK)
        borrow = d >> BASE_BITS
    ge = borrow >= 0  # no final borrow -> r >= p
    out = [jnp.where(ge, sub[i].astype(jnp.uint32), r[i]) for i in range(L)]
    o_ref[...] = jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=8)
def make_mont_mul_kernel(ctx_name: str, interpret: bool = False):
    from .. import limbs

    ctx = {
        c.name: c
        for c in (limbs.P256_P, limbs.P256_N, limbs.TOM_P, limbs.TOM_N, limbs.WAR_P)
    }[ctx_name]
    L = ctx.nlimbs

    def call(aT: jnp.ndarray, bT: jnp.ndarray) -> jnp.ndarray:
        # aT, bT: [L, M] with M % BLOCK_B == 0
        M = aT.shape[1]
        grid = (M // BLOCK_B,)
        return pl.pallas_call(
            functools.partial(_kernel_body, ctx),
            out_shape=jax.ShapeDtypeStruct((L, M), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (L, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(aT, bT)

    return call


def mont_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in Montgomery product via the Pallas kernel.

    a, b: [..., L] uint32 (Montgomery domain).  Handles broadcast, the
    [L, B] transpose and lane padding."""
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    L = ctx.nlimbs
    flat_a = a.reshape(-1, L)
    flat_b = b.reshape(-1, L)
    M = flat_a.shape[0]
    padded = -(-M // BLOCK_B) * BLOCK_B
    if padded != M:
        pad = ((0, padded - M), (0, 0))
        flat_a = jnp.pad(flat_a, pad)
        flat_b = jnp.pad(flat_b, pad)
    out = make_mont_mul_kernel(ctx.name, interpret)(flat_a.T, flat_b.T)
    return out.T[:M].reshape(batch + (L,))
