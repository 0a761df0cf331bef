"""Multi-chip sharding (SURVEY sections 2.3 / 5: the reference is
single-threaded; parallelism is a first-class component we add).

Axes of parallelism for ZKAttest on a TPU slice:

* ``dp``  - data parallelism over independent proof instances (the proof
  batch dimension).  Embarrassingly parallel; no collectives in the prove
  phases, psum only for verifier aggregates.
* ``ring`` - the scaling axis (SURVEY section 5 "long-context analog"):
  ring elements of the Groth-Kohlweiss recombination are sharded across
  chips and partial totals reduced with ``psum``; the same axis carries
  sharded MSM lanes for the batch verifier.

Everything uses `jax.sharding.Mesh` + `shard_map` with XLA collectives -
the TPU-native replacement for the "communication backend" row of the
survey.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.curve_ops import tom_ops
from ..ops.f32field import TOM_N

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "replicate",
    "sharded_commit",
    "sharded_gk_total",
    "sharded_msm",
]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(dp: int, ring: int) -> Mesh:
    devs = np.asarray(jax.devices()[: dp * ring]).reshape(dp, ring)
    return Mesh(devs, ("dp", "ring"))


def shard_batch(mesh: Mesh | None, x: jnp.ndarray, axis: str = "dp"):
    """Place ``x`` with its leading (batch) dimension sharded over ``axis``
    and all other dims replicated.  No-op when ``mesh`` is None, so pipeline
    code can shard unconditionally.  The batch dim must divide evenly: the
    proof batch is padded by the caller (BatchProver/BatchVerifier pad with
    repeated instances), never silently here."""
    if mesh is None:
        return x
    n = mesh.shape[axis]
    if x.shape[0] % n != 0:
        raise ValueError(
            f"batch dim {x.shape[0]} not divisible by mesh axis "
            f"'{axis}' size {n}; pad the batch"
        )
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh | None, tree):
    """Replicate every array leaf of a pytree across the mesh (the Pedersen
    base tables, ring value vectors, ... - operands every shard needs)."""
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), tree)


def sharded_commit(mesh: Mesh, dev_params, vals: jnp.ndarray, blinds: jnp.ndarray):
    """Pedersen commitments with the batch dimension sharded over ``dp``.
    Pure data parallelism: each chip commits its shard with the replicated
    base tables; no collectives."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    def step(v, r):
        return dev_params.commit_tom(v, r, v_canon=True)

    return step(vals, blinds)


def sharded_gk_total(
    mesh: Mesh,
    f_or_xf: jnp.ndarray,  # [RING, n, L] per-element selected factors (mont)
    vec: jnp.ndarray,  # [RING, L] ring values (mont)
):
    """The GK verifier's O(N*n) ring recombination
    (reference src/proofGK/gk.ts:239-250) with ring elements sharded over
    the ``ring`` axis: each chip multiplies its shard's n factors and
    accumulates v_i * prod_j factor_ij; partial sums meet in one psum.

    Returns the total as a [L] Montgomery element (replicated)."""
    fo = TOM_N
    n = f_or_xf.shape[1]

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("ring"), P("ring")),
        out_specs=P(),
    )
    def step(factors, values):
        prod = factors[:, 0]
        for j in range(1, n):
            prod = fo.mul(prod, factors[:, j])
        terms = fo.mul(values, prod)
        # local tree-sum then cross-chip reduction; field addition is not
        # a jnp sum, so psum the *limb vectors* of partial sums modulo p
        # is invalid - instead reduce with our add via ppermute-free trick:
        # sum locally, then all_gather partials and fold.
        local = terms[0]
        for i in range(1, terms.shape[0]):
            local = fo.add(local, terms[i])
        gathered = jax.lax.all_gather(local, "ring")  # [n_dev, L]
        total = gathered[0]
        for i in range(1, gathered.shape[0]):
            total = fo.add(total, gathered[i])
        return total

    return step(f_or_xf, vec)


def sharded_msm(mesh: Mesh, ops, points: jnp.ndarray, digits: jnp.ndarray):
    """sum_i s_i * P_i with terms sharded over ``ring``: each chip runs the
    windowed multiplies for its shard and tree-reduces locally; the per-chip
    partial points are all-gathered and folded (group addition is not a
    psum-able monoid over raw limbs, so the fold happens in-kernel)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P("ring"), P("ring")),
        out_specs=P(),
    )
    def step(pts, digs):
        local = ops.sum_reduce(ops.scalar_mul(pts, digs), axis=0)
        gathered = jax.lax.all_gather(local, "ring")  # [n_dev, C, L]
        acc = gathered[0]
        for i in range(1, gathered.shape[0]):
            acc = ops.add(acc, gathered[i])
        return acc

    return step(points, digits)
