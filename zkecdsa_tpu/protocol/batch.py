"""Batched ZKAttest prover - the TPU-native pipeline (configs 2-4 of
BASELINE.md).

Redesign of the reference's sequential prover (reference
src/zkpAttestList.ts:104-145, src/exp/exp.ts:126-231) as phase-structured
batched computation:

* phase A (device): R/Q recovery, all commitments and the 80 exp rounds'
  T/A/Tx/Ty for every instance at once - [N] and [N, 80] batches;
* challenge (host): Fiat-Shamir over serialized points, per instance;
* phase B (device): the even-bit branch (T1, coordinate commitments, all
  point-add sub-proof commitments) computed for ALL rounds - static shapes,
  the challenge bit only selects which response shape is assembled;
* responses (host): scalar arithmetic + proof-object assembly, producing
  the same ``SignatureProofList`` objects (and wire bytes) as the host
  scalar prover.

Randomness: each instance draws its tape through the rng seam in exactly
the reference's order, so a batched proof is bit-identical to the host
prover run under the same per-instance source (tested in
tests/test_batch_prove.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bignum import big
from ..commit.equality import EqualityProof
from ..commit.mult import MultProof
from ..commit.pedersen import Commitment, PedersenParams
from ..curves.edwards import TEdwardsPoint
from ..curves.group import Scalar
from ..curves.instances import p256, tomEdwards256
from ..curves.weier import WeierstrassPoint
from ..exp.exp import ExpProof
from ..exp.pointAdd import PointAddProof
from ..proofGK.gk import GKProof
from ..proofGK.interpolate import interpolate
from ..utils import rng
from ..zkp_attest_list import SignatureProofList, SystemParametersList, _truncate_to_n
from ..ops.curve_ops import p256_ops, tom_ops
from ..ops.f32field import P256_N, TOM_N

__all__ = ["BatchProver", "batched_prove_signature_list", "device_params_for"]

SECPARAM = 80


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def _digits_host(ctx, x: jnp.ndarray) -> jnp.ndarray:
    """Window digits of a HOST-PACKED scalar array (canonical digits by
    construction of ``F32Field.pack``): fast path, no canon ripple."""
    return ctx.digits4_canonical(x)


def _digits_dev(ctx, x: jnp.ndarray) -> jnp.ndarray:
    """Window digits of a DEVICE-COMPUTED array (redundant digits - every
    field op's output): canonicalizes first.  Using the host fast path on
    these was the round-2 batched-pipeline regression (VERDICT r2)."""
    return ctx.digits4(x)


def _bytes_host(ctx, x: jnp.ndarray) -> jnp.ndarray:
    """Comb-path byte digits of a CANONICAL digit array (host-packed, or a
    ``canon``/affine-pass output).  Same invariant contract as
    :func:`_digits_host`."""
    return ctx.digits8_canonical(x)


def _bytes_dev(ctx, x: jnp.ndarray) -> jnp.ndarray:
    """Comb-path byte digits of redundant device digits: canon first."""
    return ctx.digits8_canonical(ctx.canon(x))


def _std(ctx, x_mont: jnp.ndarray) -> jnp.ndarray:
    return ctx.from_mont(x_mont)


class DeviceParams:
    """Device-side precomputation for one SystemParametersList: window
    tables for the four static bases (Tom g/h, P-256 G/h).  Construct via
    :func:`device_params_for` to share one instance (and its compiled
    phase programs) across provers/verifiers of content-equal params."""

    def __init__(self, params: SystemParametersList) -> None:
        self.params = params
        # Window tables are built with HOST EC arithmetic (16 tiny muls
        # each, once per parameter set) and handed to the jitted phase
        # programs as OPERANDS (see the ``tabs`` pytree) - never closed
        # over, so the compiled programs are parameter-set-independent.
        self.tab_g_tom = self._host_table(tom_ops, params.proof_group.g)
        self.tab_h_tom = self._host_table(tom_ops, params.proof_group.h)
        self.tab_G = self._host_table(p256_ops, p256.generator())
        self.tab_h_nist = self._host_table(p256_ops, params.nist_group.h)
        # Comb tables for the static Pedersen bases (built ON DEVICE from
        # one packed point; ~5-6 MB each): the commit stacks then run with
        # zero doublings - see CurveOps.comb_table.  The Tom tables use
        # the MIXED-add layout (affine entries + precomputed d*T2/a*X2:
        # 9 muls per window add instead of 11, EdwardsOps.comb_table_mixed).
        self.comb_g_tom = np.asarray(
            tom_ops.comb_table_mixed(jnp.asarray(self.tab_g_tom[1]))
        )
        self.comb_h_tom = np.asarray(
            tom_ops.comb_table_mixed(jnp.asarray(self.tab_h_tom[1]))
        )
        self.comb_h_nist = np.asarray(
            p256_ops.comb_table(jnp.asarray(self.tab_h_nist[1]))
        )

    def tabs(self) -> dict:
        """The table pytree passed to the phase programs."""
        return {
            "G": jnp.asarray(self.tab_G),
            "h_n": jnp.asarray(self.tab_h_nist),
            "g_t": jnp.asarray(self.tab_g_tom),
            "h_t": jnp.asarray(self.tab_h_tom),
            "g_t8": jnp.asarray(self.comb_g_tom),
            "h_t8": jnp.asarray(self.comb_h_tom),
            "h_n8": jnp.asarray(self.comb_h_nist),
        }

    @staticmethod
    def _host_table(ops, base) -> np.ndarray:
        """[16, C, L] window table of 0..15 multiples, computed with host
        EC arithmetic (16 tiny muls, done once per parameter set)."""
        group = base.group
        pts = [group.identity()]
        for _ in range(15):
            pts.append(pts[-1].add(base))
        return ops.pack_points(pts)

    # -- batched commitment on the proof group: g*v + h*r ------------------
    def commit_tom(
        self, v_std: jnp.ndarray, r_std: jnp.ndarray, *,
        v_canon: bool, r_canon: bool = True,
    ) -> jnp.ndarray:
        """Pedersen commit on Tom-256 via the fixed-base comb path (the
        bases are static).  ``v_canon``/``r_canon`` declare the digit
        invariant of each operand: True = canonical digits (host-packed,
        or device ``canon`` output - fast window extraction), False =
        redundant device digits (canonicalized first).  ``v_canon`` is
        keyword-required so every call site states which it has - the
        round-2 regression was a redundant value silently taking the
        canonical fast path."""
        dv = (_bytes_host if v_canon else _bytes_dev)(TOM_N, v_std)
        dr = (_bytes_host if r_canon else _bytes_dev)(TOM_N, r_std)
        return tom_ops.double_mul_comb_mixed(
            jnp.asarray(self.comb_g_tom), dv, jnp.asarray(self.comb_h_tom), dr
        )


@functools.lru_cache(maxsize=8)
def _device_params_cached(params_json: str) -> DeviceParams:
    from ..serde import read_json

    return DeviceParams(read_json(SystemParametersList, params_json))


def device_params_for(params: SystemParametersList) -> DeviceParams:
    """One shared DeviceParams (window tables + compiled phase programs)
    per *content-equal* parameter set: keyed by the params' canonical wire
    serialization, so two deserialized copies of the same params reuse one
    set of compiled programs."""
    from ..serde import write_json

    return _device_params_cached(write_json(SystemParametersList, params))


# The four static Pedersen base tables are passed as a pytree ARGUMENT
# (``tabs``: {"G", "h_n", "g_t", "h_t"}), not closed over: a closed-over
# numpy table inlines as an XLA literal, making the compiled phase program
# specific to ONE parameter set - every new SystemParametersList then paid
# the full multi-minute compile.  As operands, one compiled program (keyed
# by shapes only) serves every parameter set and the persistent cache hits
# across processes.

fw = p256_ops.f  # P-256 base field
ft = tom_ops.f  # Tom base field
fn = P256_N  # P-256 scalar field
fo = TOM_N  # Tom scalar field (== P-256 base prime)


def tom_affine_std(P):
    """Affine + canon: canonical digits cost one cheap device pass and
    buy (a) the fast window-digit path for downstream commits and
    (b) vectorized host unpacking (unpack_canonical)."""
    x, y, _ = tom_ops.to_affine(P)
    return ft.canon(x), ft.canon(y)


def nist_affine_std(P):
    x, y, inf = p256_ops.to_affine(P)
    return fw.canon(x), fw.canon(y), inf


def _phase_fns(dev: DeviceParams):
    """The jitted phase programs (module-level, params-independent)."""
    return _PHASE_A, _PHASE_B


def phase_a(tabs, pk, u1, u2, z1, s1, com_r, pkx_v, pkx_r, pky_v, pky_r,
            alpha, r_rnd, txr, tyr):
    # Every window-mul scan body costs ~6k HLO ops, so same-shape
    # device calls are merged into stacked batches: 13 scans -> 6
    # (VERDICT r2 weak #4, compile-time pathology).
    # Host-packed scalars arrive uint8 (see _pk_scalars); cast on device.
    (u1, u2, z1, s1, com_r, pkx_v, pkx_r, pky_v, pky_r, alpha, r_rnd,
     txr, tyr) = (
        v.astype(jnp.float32)
        for v in (u1, u2, z1, s1, com_r, pkx_v, pkx_r, pky_v, pky_r,
                  alpha, r_rnd, txr, tyr)
    )
    N = pk.shape[0]
    L = fn.nlimbs
    # R = u1*G + u2*PK  (zkpAttestList.ts:125-131)
    tab_pk = p256_ops.table(pk)
    R = p256_ops.double_mul_tables(
        tabs["G"], _digits_host(fn, u1), tab_pk, _digits_host(fn, u2)
    )
    tab_R = p256_ops.table(R)
    # comS1 = s1*R + com_r*h (pedersen.ts:53-58 with g := R) and
    # Q = z1*G + 0*h (zkpAttestList.ts:133-136) as ONE stacked Shamir
    # mul [N, 2] (row 1's zero scalar gathers only identities)
    tp = jnp.stack(
        [tab_R, jnp.broadcast_to(tabs["G"], tab_R.shape)], axis=1
    )  # [N, 2, 16, 3, L]
    dP = jnp.stack([_digits_host(fn, s1), _digits_host(fn, z1)], axis=1)
    dQ = jnp.stack(
        [_digits_host(fn, com_r), jnp.zeros(com_r.shape[:-1] + (64,), com_r.dtype)],
        axis=1,
    )
    cq = p256_ops.double_mul_tables(tp, dP, tabs["h_n"], dQ)
    comS1, Q = cq[:, 0], cq[:, 1]
    # D = Q - comS1 + com_r*h_n: the per-instance constant of the
    # even-round relation T1 = z*R + Q = alpha*R - s1*R + Q
    #                        = T - (comS1 - com_r*h_n) + Q = T + D,
    # which lets phase B replace its [N, E] 64-step windowed T1 scan
    # with ONE point add per even round (exp.ts:190-193 algebra; the
    # group element is identical, and the affine pass canonicalizes the
    # projective representative, so the wire bytes are unchanged).
    Hc = p256_ops.mul_comb(tabs["h_n8"], _bytes_host(fn, com_r))
    D = p256_ops.add(p256_ops.add(Q, p256_ops.neg(comS1)), Hc)
    # 80 rounds: T_i = alpha_i * R via a per-instance 4-bit comb table
    # (one ~252-dbl/960-add build amortized over the 80 scalars sharing
    # R - zero doublings per round; CurveOps.comb4_table) and
    # Hr_i = r_i * h (STATIC base: comb path, zero doublings - exp.ts:144-150)
    T = p256_ops.mul_comb4(
        p256_ops.comb4_table(R), _digits_host(fn, alpha)
    )  # [N, 80, 3, L]
    Hr = p256_ops.mul_comb(tabs["h_n8"], _bytes_host(fn, r_rnd))
    A = p256_ops.add(T, Hr)
    # ONE P-256 affine pass: rows [R, Q, comS1] ++ T(80) ++ A(80)
    nist_stack = jnp.concatenate(
        [jnp.stack([R, Q, comS1], axis=1), T, A], axis=1
    )  # [N, 163, 3, L]
    nx, ny, _ = nist_affine_std(nist_stack)
    small_x, small_y = nx[:, :3], ny[:, :3]
    Tx_v, Ty_v = nx[:, 3:83], ny[:, 3:83]
    ta_x = jnp.stack([nx[:, 3:83], nx[:, 83:163]], axis=2)  # [N,80,2,L]
    ta_y = jnp.stack([ny[:, 3:83], ny[:, 83:163]], axis=2)
    # ONE Tom commit for pkX, pkY (exp.ts args) and the 80 rounds'
    # Tx/Ty coordinate commitments (exp.ts:151-156): rows
    # [pkX, pkY] ++ [Tx_0, Ty_0, ..., Tx_79, Ty_79] = [N, 162].
    # The T coordinates come out of nist_affine_std CANONICAL (its
    # canon pass exists exactly so this commit may use the fast digit
    # path; committing redundant digits through it was the r2
    # correctness regression - tests/test_pipeline_gate.py guards it).
    pk_vals = jnp.stack([pkx_v, pky_v], axis=1)  # [N, 2, L]
    tc_vals = jnp.stack([Tx_v, Ty_v], axis=2).reshape(N, 2 * SECPARAM, L)
    dv8 = _bytes_host(fo, jnp.concatenate([pk_vals, tc_vals], axis=1))
    blinds = jnp.concatenate(
        [
            jnp.stack([pkx_r, pky_r], axis=1),
            jnp.stack([txr, tyr], axis=2).reshape(N, 2 * SECPARAM, L),
        ],
        axis=1,
    )
    allC = tom_ops.double_mul_comb_mixed(
        tabs["g_t8"], dv8, tabs["h_t8"], _bytes_host(fo, blinds)
    )  # [N, 162, 4, L]
    pkC = allC[:, :2]
    TC = allC[:, 2:].reshape(N, SECPARAM, 2, 4, L)
    tcx, tcy = tom_affine_std(allC)  # one Tom affine pass
    # host-bound canonical outputs ship as uint8 digits (exact: canonical
    # digits are < 128), 4x less device->host transfer than f32
    u8 = lambda v: v.astype(jnp.uint8)  # noqa: E731
    return {
        "T": T, "D": D, "TC": TC, "pkC": pkC,
        "small_aff": (u8(small_x), u8(small_y)),  # [N, 3(R,Q,comS1), L]
        "TA_aff": (u8(ta_x), u8(ta_y)),  # [N, 80, 2(T,A), L]
        "T_v": (Tx_v, Ty_v),
        "pk_aff": (u8(tcx[:, :2]), u8(tcy[:, :2])),  # [N, 2, L]
        "TC_aff": (
            u8(tcx[:, 2:].reshape(N, SECPARAM, 2, L)),
            u8(tcy[:, 2:].reshape(N, SECPARAM, 2, L)),
        ),  # [N, 80, 2, L]
    }

def phase_b(tabs, T, D, TxC, TyC, pkX, pkY, Tx_v, pkx_v, pky_v, pky_r,
            txr_e, com_vals, com_blinds, eidx):
    """com_vals/com_blinds: [N, E, BK, L] stacked Pedersen inputs in the
    _SLOT order; values at slots 0/1 (t1x/t1y) are placeholders
    overwritten here once T1 is known.  One commit call (commit stack +
    the C4/A42 rows, see below), one stacked affine conversion.

    E <= 80 is the compacted EVEN-round axis: only even-challenge-bit
    rounds carry a point-add sub-proof (exp.ts:184-225), and the host
    knows the challenge before this dispatch - so the per-round inputs
    arrive pre-compacted ([N, E] instead of [N, 80], E = per-batch max
    even count quantized to {48, 56, 64, 80} to bound recompiles) and
    ``eidx`` [N, E] selects each instance's even rounds from the
    phase-A round-axis outputs (TxC/TyC/Tx_v/T).  Padding rows (eidx
    repeats the last even round) compute garbage that is never
    unpacked.  This cuts ~2.4x of the commit stack, the affine pass,
    and the device->host transfer.

    NO dynamic-base windowed multiplies remain here (round-5 rework;
    they were ~half the phase FLOPs):

    * T1 = z*R + Q (exp.ts:190-193) is computed as T + D with the
      per-instance D = Q - comS1 + com_r*h_n from phase A - one
      complete point add per even round instead of a 64-step scan;
    * the four mult sub-proofs' C4_j = x_j * Cy_j and A42_j =
      kx_j * Cy_j (pointAdd.ts:145-156, mult.ts:105-115) expand the
      Pedersen commitments: Cy_j = g*y_j + h*r_j, so
      x * Cy = g*(x*y) + h*(x*r) - two field multiplies each, and the
      points ride the fixed-base mixed comb path as 8 extra rows of
      the SAME stacked commit call.  The group elements are identical
      (commitment homomorphism over the Tom order), and the affine
      pass canonicalizes representatives, so wire bytes are unchanged.
    """
    # uint8-shipped host-packed inputs cast up on device (_pk_scalars)
    pkx_v, pky_v, pky_r, txr_e, com_vals, com_blinds = (
        v.astype(jnp.float32)
        for v in (pkx_v, pky_v, pky_r, txr_e, com_vals, com_blinds)
    )

    def sel_rounds(arr):
        idx = eidx.reshape(eidx.shape + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(arr, idx, axis=1)

    TxC, TyC, Tx_v, T_e = (sel_rounds(a) for a in (TxC, TyC, Tx_v, T))
    # T1 = T + D on the compacted even rounds (see docstring)
    T1 = p256_ops.add(T_e, D[:, None])
    t1x, t1y, _ = nist_affine_std(T1)
    # chord-rule intermediates over the Tom order (pointAdd.ts:119-136)
    # P := T1 (x1), Q := pk (x2), R := T (x3)
    t1x_m, t1y_m = fo.to_mont(t1x), fo.to_mont(t1y)
    pkx_m, pky_m = fo.to_mont(pkx_v[:, None]), fo.to_mont(pky_v[:, None])
    txv_m = fo.to_mont(Tx_v)
    i7 = fo.sub(pkx_m, t1x_m)
    i8 = fo.batch_inv(i7.reshape(-1, i7.shape[-1])).reshape(i7.shape)
    i9 = fo.sub(pky_m, t1y_m)
    i10 = fo.mul(i8, i9)
    i11 = fo.mul(i10, i10)
    i12 = fo.sub(t1x_m, txv_m)
    i13 = fo.mul(i10, i12)
    # canon once: every downstream consumer (commit stack, host unpack)
    # then takes the canonical fast path
    ints_std = [fo.canon(v) for v in (i7, i8, i9, i10, i11, i12, i13)]
    # the four mult sub-proofs' scalar expansions (see docstring):
    # Cy_j commits y_j = [i8, i9, i10, i12] with blindings
    # rb_j = [c8_r, pky_r - t1y_r, c10_r, t1x_r - txr]; the multiplier
    # x_j = [i7, i8, i10, i10] for C4, the nonce kx_j for A42.
    ys = [i8, i9, i10, i12]
    xs = [i7, i8, i10, i10]
    rb = [
        com_blinds[..., 2, :],                                  # c8_r
        fo.sub(pky_r[:, None], com_blinds[..., 1, :]),          # C9.r
        com_blinds[..., 3, :],                                  # c10_r
        fo.sub(com_blinds[..., 0, :], txr_e),                   # C12.r
    ]
    kx = com_vals[..., 6:10, :]
    ext_vals = fo.canon(jnp.stack(
        [fo.mul(x, y) for x, y in zip(xs, ys)]
        + [fo.mul(kx[..., j, :], ys[j]) for j in range(4)],
        axis=-2,
    ))  # [N, E, 8, L]
    ext_blinds = fo.canon(jnp.stack(
        [fo.mul(x, r) for x, r in zip(xs, rb)]
        + [fo.mul(kx[..., j, :], rb[j]) for j in range(4)],
        axis=-2,
    ))
    # fill computed values into the commit stack (slots 0..5); t1x/t1y
    # are canonical from nist_affine_std, ints_std from the canon above,
    # remaining slots are host-packed - the whole stack is canonical
    fills = [t1x, t1y, ints_std[1], ints_std[3], ints_std[4], ints_std[6]]
    com_vals = com_vals.at[..., :6, :].set(jnp.stack(fills, axis=-2))
    commits = tom_ops.double_mul_comb_mixed(
        tabs["g_t8"],
        _bytes_host(fo, jnp.concatenate([com_vals, ext_vals], axis=-2)),
        tabs["h_t8"],
        _bytes_host(fo, jnp.concatenate([com_blinds, ext_blinds], axis=-2)),
    )  # [N, E, BK+8, 4, L]: slots 26..29 = C4_j, 30..33 = A42_j
    T1xC = commits[..., 0, :, :]
    T1yC = commits[..., 1, :, :]
    # homomorphic difference commitments (pointAdd.ts:137-143); the
    # verifier-recomputed combinations (pointAdd.ts:124-138 C7/C9/C12,
    # :134/:138 the two equality statements) are computed HERE so the
    # host Fiat-Shamir never does EC arithmetic (the former per-round
    # Commitment.sub/add chains were an O(N*80) host tail, VERDICT r3
    # weak #3); only their affine bytes feed the sub-proof hashes
    C9 = tom_ops.add(pkY[:, None], tom_ops.neg(T1yC))
    C12 = tom_ops.add(T1xC, tom_ops.neg(TxC))
    C7 = tom_ops.add(pkX[:, None], tom_ops.neg(T1xC))
    cintX = tom_ops.add(tom_ops.add(TxC, T1xC), pkX[:, None])
    cintY = tom_ops.add(TyC, T1yC)
    combos = jnp.stack([C7, C9, C12, cintX, cintY], axis=-3)
    # one affine conversion for every Tom point produced here
    tom_stack = jnp.concatenate([commits, combos], axis=-3)
    sx, sy = tom_affine_std(tom_stack)  # [N, E, NSLOT, L]
    u8 = lambda v: v.astype(jnp.uint8)  # noqa: E731 (see phase_a)
    return {
        "tom_aff": (u8(sx), u8(sy)),
        "ints": [u8(v) for v in ints_std],
    }

def phase_b_flat(tabs, T, D, TxC, TyC, pkX, pkY, Tx_v, pkx_v, pky_v, pky_r,
                 txr_e, com_vals, com_blinds, srcid):
    """Flat-row variant of :func:`phase_b` for the UNSHARDED path.

    The [N, E] layout pads every instance to the batch's quantized max
    even-round count (E=56 for ~40 real rounds: ~29% of the dominant
    commit-stack/affine work is padding).  Here all real even rounds
    flatten to one [K] row axis (K = total evens quantized to a
    multiple of 512 - binomial concentration makes the bucket stable
    across batches): ``srcid`` [K] holds each row's flattened (i*80+j)
    phase-A index, per-round device data is gathered from the
    [N*80, ...] views, and per-instance host-packed scalars arrive
    pre-expanded to [K].  Padding rows repeat the last real row.  The
    dp-sharded path keeps :func:`phase_b`: a global row gather would
    break GSPMD's per-shard locality (cross-shard all-gathers), while
    [N, E] partitions cleanly on the instance axis.

    Same math row-for-row as phase_b; tests assert identical wire
    bytes."""
    pkx_v, pky_v, pky_r, txr_e, com_vals, com_blinds = (
        v.astype(jnp.float32)
        for v in (pkx_v, pky_v, pky_r, txr_e, com_vals, com_blinds)
    )
    NR = T.shape[0] * T.shape[1]
    inst = srcid // SECPARAM  # [K] instance of each row

    def rounds(arr):  # [N, 80, ...] -> [K, ...]
        return arr.reshape((NR,) + arr.shape[2:])[srcid]

    def per_inst(arr):  # [N, ...] -> [K, ...]
        return arr[inst]

    TxC, TyC, Tx_v, T_e = (a for a in map(rounds, (TxC, TyC, Tx_v, T)))
    pkX, pkY, D = per_inst(pkX), per_inst(pkY), per_inst(D)
    # T1 = T + D (see phase_b)
    T1 = p256_ops.add(T_e, D)
    t1x, t1y, _ = nist_affine_std(T1)
    t1x_m, t1y_m = fo.to_mont(t1x), fo.to_mont(t1y)
    pkx_m, pky_m = fo.to_mont(pkx_v), fo.to_mont(pky_v)
    txv_m = fo.to_mont(Tx_v)
    i7 = fo.sub(pkx_m, t1x_m)
    i8 = fo.batch_inv(i7)
    i9 = fo.sub(pky_m, t1y_m)
    i10 = fo.mul(i8, i9)
    i11 = fo.mul(i10, i10)
    i12 = fo.sub(t1x_m, txv_m)
    i13 = fo.mul(i10, i12)
    ints_std = [fo.canon(v) for v in (i7, i8, i9, i10, i11, i12, i13)]
    ys = [i8, i9, i10, i12]
    xs = [i7, i8, i10, i10]
    rb = [
        com_blinds[..., 2, :],
        fo.sub(pky_r, com_blinds[..., 1, :]),
        com_blinds[..., 3, :],
        fo.sub(com_blinds[..., 0, :], txr_e),
    ]
    kx = com_vals[..., 6:10, :]
    ext_vals = fo.canon(jnp.stack(
        [fo.mul(x, y) for x, y in zip(xs, ys)]
        + [fo.mul(kx[..., j, :], ys[j]) for j in range(4)],
        axis=-2,
    ))
    ext_blinds = fo.canon(jnp.stack(
        [fo.mul(x, r) for x, r in zip(xs, rb)]
        + [fo.mul(kx[..., j, :], rb[j]) for j in range(4)],
        axis=-2,
    ))
    fills = [t1x, t1y, ints_std[1], ints_std[3], ints_std[4], ints_std[6]]
    com_vals = com_vals.at[..., :6, :].set(jnp.stack(fills, axis=-2))
    commits = tom_ops.double_mul_comb_mixed(
        tabs["g_t8"],
        _bytes_host(fo, jnp.concatenate([com_vals, ext_vals], axis=-2)),
        tabs["h_t8"],
        _bytes_host(fo, jnp.concatenate([com_blinds, ext_blinds], axis=-2)),
    )  # [K, BK+8, 4, L]
    T1xC = commits[..., 0, :, :]
    T1yC = commits[..., 1, :, :]
    C9 = tom_ops.add(pkY, tom_ops.neg(T1yC))
    C12 = tom_ops.add(T1xC, tom_ops.neg(TxC))
    C7 = tom_ops.add(pkX, tom_ops.neg(T1xC))
    cintX = tom_ops.add(tom_ops.add(TxC, T1xC), pkX)
    cintY = tom_ops.add(TyC, T1yC)
    combos = jnp.stack([C7, C9, C12, cintX, cintY], axis=-3)
    tom_stack = jnp.concatenate([commits, combos], axis=-3)
    sx, sy = tom_affine_std(tom_stack)  # [K, NSLOT, L]
    u8 = lambda v: v.astype(jnp.uint8)  # noqa: E731
    return {
        "tom_aff": (u8(sx), u8(sy)),
        "ints": [u8(v) for v in ints_std],
    }


# Whole-phase jit: every building block inside is scan-based, so the
# phase modules stay small enough to compile, and on the tunneled TPU
# backend eager composition costs ~1-15 ms per dispatched op (eager
# lax.scan is interpreted) - phases MUST be single compiled programs.
_PHASE_A = jax.jit(phase_a)
_PHASE_B = jax.jit(phase_b)
_PHASE_B_FLAT = jax.jit(phase_b_flat)


# Slot order of the stacked phase-B Pedersen commitments.  Values for slots
# 0..5 are computed on device; the host only supplies blindings there.
# 0 t1x (T1x commit)   1 t1y   2 i8 (C_8)   3 i10 (C_10)   4 i11 (C_11)
# 5 i13 (C_13)   6..9 kx_j (A_x)   10..13 ky_j (A_y)   14..17 kz_j (A_z)
# 18..21 kz_j (A_4_1)   22..23 keq_j (A_1)   24..25 keq_j (A_2)
BK = 26  # commit-stack width
_SLOT = {
    "T1x": 0, "T1y": 1, "C8": 2, "C10": 3, "C11": 4, "C13": 5,
    "Ax": 6, "Ay": 10, "Az": 14, "A41": 18, "A1": 22, "A2": 24,
    "C4": 26, "A42": 30,  # appended after the commit stack in tom_aff
    # device-computed homomorphic combinations (hash inputs only)
    "C7": 34, "C9": 35, "C12": 36, "CIX": 37, "CIY": 38,
}
NSLOT = BK + 13  # commit stack + C4s + A42s + 5 combos


# ---------------------------------------------------------------------------
# host-side helpers
# ---------------------------------------------------------------------------

def _pk_scalars(ctx, ints) -> jnp.ndarray:
    """Host-packed canonical digits shipped as uint8 (digits < 128): 4x
    less host->device transfer than f32 through the dev tunnel (the
    phase-B commit stacks alone are ~120 MB/batch at N=256 as f32); the
    phase programs cast to f32 on device."""
    return jnp.asarray(ctx.pack(ints, mont=False).astype(np.uint8))


def _tom_pt(x: int, y: int) -> TEdwardsPoint:
    return TEdwardsPoint(tomEdwards256, x, y)


def _nist_pt(x: int, y: int) -> WeierstrassPoint:
    return WeierstrassPoint(p256, x, y, 1)


def _unp(ctx, arr) -> list[int]:
    """Unpack device results; phase outputs are canonical by contract
    (the affine/canon passes above), enabling the vectorized path."""
    return ctx.unpack_canonical(arr)


class _Tape:
    """Per-instance randomness drawn in exactly the reference's order."""

    def __init__(self, source: rng.RandomSource) -> None:
        self.source = source

    def rnd(self, n: int) -> int:
        with rng.scoped(self.source):
            return big.rnd(n)

    def rnd_many(self, moduli) -> list[int]:
        """Bulk draws, byte-stream-identical to sequential ``rnd`` calls
        (big.rnd_many)."""
        return big.rnd_many(moduli, self.source)


# ---------------------------------------------------------------------------
# the batched prover
# ---------------------------------------------------------------------------

class BatchProver:
    """Batched prover; pass a ``jax.sharding.Mesh`` with a ``dp`` axis to
    shard the proof batch across devices (pure data parallelism: the jitted
    phase programs are shape-polymorphic over the batch dim, so GSPMD
    partitions them with no cross-device collectives in the prove path).
    The batch size must be divisible by the ``dp`` axis size."""

    def __init__(self, params: SystemParametersList, mesh=None) -> None:
        self.params = params
        self.dev = device_params_for(params)
        if mesh is not None and "dp" not in mesh.shape:
            raise ValueError(
                "BatchProver shards the proof batch over a 'dp' mesh axis; "
                f"got mesh axes {tuple(mesh.shape)} - build the mesh with "
                "parallel.mesh.make_mesh() or make_mesh_2d()"
            )
        self.mesh = mesh
        from ..parallel.mesh import replicate

        self.tabs = replicate(mesh, self.dev.tabs())
        self.phase_a, self.phase_b = _phase_fns(self.dev)

    def warmup(self, n: int, e: int | tuple = (56, 64)) -> None:
        """Compile the prove-phase programs for batch size ``n`` (and each
        even-round capacity in ``e``) CONCURRENTLY: ``jax.jit(...).lower()``
        + ``.compile()`` run per-phase on threads (XLA compilation drops
        the GIL), and the persistent compilation cache turns the later
        traced call into a cache load - so a cold process pays
        max(phase compile) wall instead of the sum (VERDICT r3 item 6:
        411 s sequential warm-up on chip).  The ShapeDtypeStructs carry
        the mesh shardings (advisor r4: unsharded specs under a dp mesh
        compiled programs the sharded prove path never uses).

        CAVEAT: on the tunneled single-chip dev backend, concurrent
        compile RPCs hang (observed round 4) - use this on real
        multi-controller TPU hosts; bench.py gates it behind
        BENCH_WARMUP=1."""
        import concurrent.futures

        import jax.numpy as _jnp

        L = fn.nlimbs
        f32 = _jnp.float32
        u8 = _jnp.uint8  # host-packed scalars ship as uint8 (_pk_scalars)
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P("dp"))
        else:
            batch_sh = None

        def z(*shape, dtype=u8, limbs=True):
            if limbs:
                shape = shape + (L,)
            if batch_sh is not None:
                return jax.ShapeDtypeStruct(shape, dtype, sharding=batch_sh)
            return jax.ShapeDtypeStruct(shape, dtype)

        tabs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
            if batch_sh is not None
            else jax.ShapeDtypeStruct(a.shape, a.dtype),
            self.tabs,
        )
        a_args = (
            tabs, z(n, 3, dtype=f32),
            z(n), z(n), z(n), z(n), z(n), z(n), z(n), z(n), z(n),  # 9 scalars
            z(n, SECPARAM), z(n, SECPARAM), z(n, SECPARAM), z(n, SECPARAM),
        )
        jobs = [(self.phase_a, a_args)]
        for ev in (e if isinstance(e, (tuple, list)) else (e,)):
            jobs.append((self.phase_b, (
                # T/D/TxC/TyC/pkX/pkY/Tx_v are f32 phase-A outputs; the
                # host-packed operands ship uint8
                tabs, z(n, SECPARAM, 3, dtype=f32), z(n, 3, dtype=f32),
                z(n, SECPARAM, 4, dtype=f32), z(n, SECPARAM, 4, dtype=f32),
                z(n, 4, dtype=f32), z(n, 4, dtype=f32),
                z(n, SECPARAM, dtype=f32), z(n),
                z(n), z(n), z(n, ev), z(n, ev, BK), z(n, ev, BK),
                z(n, ev, dtype=_jnp.int32, limbs=False),
            )))
        with concurrent.futures.ThreadPoolExecutor(len(jobs)) as pool:
            futs = [
                pool.submit(lambda fn_, ar: fn_.lower(*ar).compile(), f_, ar)
                for f_, ar in jobs
            ]
            for f in futs:
                f.result()

    # Largest sub-batch one prove dispatch handles: the phase-A comb4
    # tables cost ~12 MB/instance HBM ([64, 16, 3, L] f32), so 256
    # instances peak around 3 GB transient - comfortable on a 16 GB
    # chip next to the resident base tables.  Bigger batches (configs
    # 4/5: 1024-4096 proofs) chunk transparently: instances are
    # independent, so chunked proofs are bit-identical to unchunked.
    MAX_CHUNK = 256

    def prove(
        self,
        msg_hashes: Sequence[bytes],
        sig_bytes: Sequence[bytes],
        public_keys_raw: Sequence[bytes],
        whichs: Sequence[int],
        keys: list[int],
        tapes: Optional[Sequence[rng.RandomSource]] = None,
        timer=None,
    ) -> list[SignatureProofList]:
        import contextlib

        N_all = len(msg_hashes)
        if N_all > self.MAX_CHUNK:
            if tapes is None:
                tapes = [rng.get_source() for _ in range(N_all)]
            step = self.MAX_CHUNK
            if self.mesh is not None:
                dp = self.mesh.shape["dp"]
                step = max(dp, step - step % dp)
            out: list[SignatureProofList] = []
            for lo in range(0, N_all, step):
                hi = min(lo + step, N_all)
                out.extend(self.prove(
                    msg_hashes[lo:hi], sig_bytes[lo:hi],
                    public_keys_raw[lo:hi], whichs[lo:hi], keys,
                    tapes[lo:hi], timer=timer,
                ))
            return out

        stage = timer.stage if timer is not None else (lambda _n: contextlib.nullcontext())
        params = self.params
        N = len(msg_hashes)
        if params.sec_level != SECPARAM:
            raise ValueError("batched prover supports sec_level == 80")
        if tapes is None:
            tapes = [rng.get_source() for _ in range(N)]
        tapes = [_Tape(t) for t in tapes]

        n_ord = p256.order
        t_ord = tomEdwards256.order
        fn, fo = P256_N, TOM_N

        # ---- host: parse signatures (zkpAttestList.ts:113-136) ----
        pk_pts = [p256.deserialize_point(pk) for pk in public_keys_raw]
        pk_coords = [pt.to_affine() for pt in pk_pts]
        u1s, u2s, s1s, z1s = [], [], [], []
        for mh, sb in zip(msg_hashes, sig_bytes):
            z = _truncate_to_n(big.from_bytes(mh), n_ord)
            half = len(sb) // 2
            r = big.from_bytes(sb[:half])
            s = big.from_bytes(sb[half:])
            sinv = big.inv_mod(s, n_ord)
            rinv = big.inv_mod(r, n_ord)
            u1s.append(sinv * z % n_ord)
            u2s.append(sinv * r % n_ord)
            s1s.append(rinv * s % n_ord)
            z1s.append(rinv * z % n_ord)

        # ---- tape: phase-A randomness, reference order ----
        _tape_a = stage("tape.phase_a")
        _tape_a.__enter__()
        com_r, pkx_r, pky_r = [], [], []
        alpha = [[0] * SECPARAM for _ in range(N)]
        r_rnd = [[0] * SECPARAM for _ in range(N)]
        txr = [[0] * SECPARAM for _ in range(N)]
        tyr = [[0] * SECPARAM for _ in range(N)]
        # draw order per instance (must match the scalar prover exactly):
        # com_r, pkx_r, pky_r, then 80x (alpha, r_rnd, txr, tyr)
        moduli_a = [n_ord, t_ord, t_ord] + [n_ord, n_ord, t_ord, t_ord] * SECPARAM
        for i, tape in enumerate(tapes):
            d = tape.rnd_many(moduli_a)
            com_r.append(d[0])
            pkx_r.append(d[1])
            pky_r.append(d[2])
            for j in range(SECPARAM):
                alpha[i][j], r_rnd[i][j], txr[i][j], tyr[i][j] = d[
                    3 + 4 * j : 7 + 4 * j
                ]
        _tape_a.__exit__(None, None, None)

        from ..parallel.mesh import shard_batch

        mesh = self.mesh
        pk_dev = shard_batch(mesh, jnp.asarray(p256_ops.pack_points(pk_pts)))

        def pack_n(vals):  # [N, L] nist-order scalars
            return shard_batch(mesh, _pk_scalars(fn, vals))

        def pack_o(vals):
            return shard_batch(mesh, _pk_scalars(fo, vals))

        def pack_n2(rows):  # [N, 80, L]
            flat = [v for row in rows for v in row]
            return shard_batch(mesh, _pk_scalars(fn, flat).reshape(N, SECPARAM, -1))

        def pack_o2(rows):
            flat = [v for row in rows for v in row]
            return shard_batch(mesh, _pk_scalars(fo, flat).reshape(N, SECPARAM, -1))

        with stage("phase_a.pack"):
            a_args = (
                self.tabs, pk_dev, pack_n(u1s), pack_n(u2s), pack_n(z1s),
                pack_n(s1s), pack_n(com_r),
                pack_o([c[0] for c in pk_coords]), pack_o(pkx_r),
                pack_o([c[1] for c in pk_coords]), pack_o(pky_r),
                pack_n2(alpha), pack_n2(r_rnd), pack_o2(txr), pack_o2(tyr),
            )
        with stage("phase_a.device"):
            a = jax.block_until_ready(self.phase_a(*a_args))

        # host point objects for hashing / assembly
        _unpack_a = stage("phase_a.unpack")
        _unpack_a.__enter__()
        sm_x = _unp(p256_ops.f, a["small_aff"][0])  # [N*3]: R, Q, comS1
        sm_y = _unp(p256_ops.f, a["small_aff"][1])
        R_pts = [_nist_pt(sm_x[i * 3], sm_y[i * 3]) for i in range(N)]
        com_pts = [_nist_pt(sm_x[i * 3 + 2], sm_y[i * 3 + 2]) for i in range(N)]
        pk_x = _unp(tom_ops.f, a["pk_aff"][0])  # [N*2]: pkX, pkY
        pk_y = _unp(tom_ops.f, a["pk_aff"][1])
        pkX_pts = [_tom_pt(pk_x[i * 2], pk_y[i * 2]) for i in range(N)]
        pkY_pts = [_tom_pt(pk_x[i * 2 + 1], pk_y[i * 2 + 1]) for i in range(N)]
        ta_x = _unp(p256_ops.f, a["TA_aff"][0])  # [N*80*2]: T, A
        ta_y = _unp(p256_ops.f, a["TA_aff"][1])
        tc_x = _unp(tom_ops.f, a["TC_aff"][0])  # [N*80*2]: TxC, TyC
        tc_y = _unp(tom_ops.f, a["TC_aff"][1])

        def ta(i, j, s):
            k = (i * SECPARAM + j) * 2 + s
            return ta_x[k], ta_y[k]

        def tc(i, j, s):
            k = (i * SECPARAM + j) * 2 + s
            return tc_x[k], tc_y[k]

        A_pts = [[_nist_pt(*ta(i, j, 1)) for j in range(SECPARAM)] for i in range(N)]
        TxC_pts = [[_tom_pt(*tc(i, j, 0)) for j in range(SECPARAM)] for i in range(N)]
        TyC_pts = [[_tom_pt(*tc(i, j, 1)) for j in range(SECPARAM)] for i in range(N)]

        _unpack_a.__exit__(None, None, None)

        # ---- challenges (exp.ts:158-165), hashed in one threaded batch
        # from the device's canonical affine coordinates - no host point
        # serialization in the loop (VERDICT r3 weak #3)
        with stage("challenges.hash"):
            from .fiat_shamir import challenge_rows, point_bytes

            fbt, fbn = 33, 32  # Tom / P-256 coordinate widths
            pk_b = point_bytes(
                tom_ops.f, a["pk_aff"][0], a["pk_aff"][1], fbt
            ).reshape(N, 2 * (1 + 2 * fbt))
            A_b = point_bytes(
                p256_ops.f, a["TA_aff"][0][:, :, 1], a["TA_aff"][1][:, :, 1], fbn
            ).reshape(N, SECPARAM, 1 + 2 * fbn)
            tc_b = point_bytes(
                tom_ops.f, a["TC_aff"][0], a["TC_aff"][1], fbt
            ).reshape(N, SECPARAM, 2 * (1 + 2 * fbt))
            rounds_b = np.concatenate([A_b, tc_b], axis=2).reshape(N, -1)
            challenges = challenge_rows([pk_b, rounds_b])

        # ---- tape: phase-B randomness (even bits only, reference order) --
        _tape_b = stage("tape.phase_b")
        _tape_b.__enter__()
        zvals = [[0] * SECPARAM for _ in range(N)]
        names_b = ("t1x_r", "t1y_r", "c8_r", "c10_r", "c11_r", "c13_r")
        tape_b = {k: [[0] * SECPARAM for _ in range(N)] for k in names_b}
        kx = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        ky = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        kz = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        axr = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        ayr = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        azr = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        a41r = [[[0] * 4 for _ in range(SECPARAM)] for _ in range(N)]
        keq = [[[0] * 2 for _ in range(SECPARAM)] for _ in range(N)]
        a1r = [[[0] * 2 for _ in range(SECPARAM)] for _ in range(N)]
        a2r = [[[0] * 2 for _ in range(SECPARAM)] for _ in range(N)]
        even_mask = [[False] * SECPARAM for _ in range(N)]
        for i, tape in enumerate(tapes):
            ch = challenges[i]
            ev = []
            for j in range(SECPARAM):
                zvals[i][j] = (alpha[i][j] - s1s[i]) % n_ord
                if not (ch & 1):
                    even_mask[i][j] = True
                    ev.append(j)
                ch >>= 1
            # 40 Tom-order draws per even round, bulk-drawn then laid out
            # in exactly the sequential order: the prove_exp even branch
            # (exp.ts:195-200) t1x_r/t1y_r, the provePointAdd commits
            # C8/C10/C11/C13 (pointAdd.ts:138-143), then the sub-proofs
            # pi8, pi10, pi11, pix, pi13, piy (7 draws per mult proof,
            # 3 per equality proof)
            d = tape.rnd_many([t_ord] * (40 * len(ev)))
            p = 0
            for j in ev:
                for nm in names_b:
                    tape_b[nm][i][j] = d[p]
                    p += 1
                for sub in ("m0", "m1", "m2", "e0", "m3", "e1"):
                    if sub.startswith("m"):
                        jj = {"m0": 0, "m1": 1, "m2": 2, "m3": 3}[sub]
                        (
                            kx[i][j][jj], ky[i][j][jj], kz[i][j][jj],
                            axr[i][j][jj], ayr[i][j][jj], azr[i][j][jj],
                            a41r[i][j][jj],
                        ) = d[p : p + 7]
                        p += 7
                    else:
                        jj = 0 if sub == "e0" else 1
                        keq[i][j][jj], a1r[i][j][jj], a2r[i][j][jj] = d[
                            p : p + 3
                        ]
                        p += 3
        _tape_b.__exit__(None, None, None)

        # compacted even-round axis: only even-challenge rounds reach the
        # device (the host knows the challenge bits here).  Unsharded:
        # ONE flat [K] row axis over all instances' even rounds
        # (phase_b_flat; zero per-instance padding, K quantized to a
        # multiple of 512).  dp-sharded: the [N, E] layout (phase_b; E =
        # per-batch max even count quantized to {48, 56, 64, 80}), which
        # partitions on the instance axis without cross-shard gathers.
        _pack_b = stage("phase_b.pack")
        _pack_b.__enter__()
        even_idx = [
            [j for j in range(SECPARAM) if even_mask[i][j]] for i in range(N)
        ]
        cnt = np.array([len(r) for r in even_idx], np.int64)
        flat = mesh is None

        def commit_rows(pairs):
            """[_SLOT]-ordered commit stack inputs for (i, j) rows."""
            vals_rows, blind_rows, txr_rows = [], [], []
            for i, j in pairs:
                txr_rows.append(txr[i][j])
                vals_rows += [0] * 6  # device fills t1x,t1y,i8,i10,i11,i13
                vals_rows += kx[i][j] + ky[i][j] + kz[i][j] + kz[i][j]
                vals_rows += keq[i][j] + keq[i][j]
                blind_rows += [tape_b[nm][i][j] for nm in names_b]
                blind_rows += axr[i][j] + ayr[i][j] + azr[i][j] + a41r[i][j]
                blind_rows += a1r[i][j] + a2r[i][j]
            return vals_rows, blind_rows, txr_rows

        if flat:
            pairs = [(i, j) for i in range(N) for j in even_idx[i]]
            K_real = len(pairs)
            if not pairs:  # all-odd challenges across the whole batch
                pairs = [(0, 0)]
            quantum = 64 if K_real <= 512 else 512
            K = max(quantum, -(-K_real // quantum) * quantum)
            pairs_p = pairs + [pairs[-1]] * (K - K_real)
            vals_rows, blind_rows, txr_even = commit_rows(pairs_p)
            srcid = np.array(
                [i * SECPARAM + j for i, j in pairs_p], np.int32
            )
            com_vals = _pk_scalars(fo, vals_rows).reshape(K, BK, -1)
            com_blinds = _pk_scalars(fo, blind_rows).reshape(K, BK, -1)
            pkxv_r = pack_o([pk_coords[i][0] for i, _ in pairs_p])
            pkyv_r = pack_o([pk_coords[i][1] for i, _ in pairs_p])
            pkyr_r = pack_o([pky_r[i] for i, _ in pairs_p])
            txr_e = _pk_scalars(fo, txr_even)
        else:
            mx = int(cnt.max()) if N else 0
            E = next(e for e in (48, 56, 64, SECPARAM) if mx <= e)
            eidx_np = np.zeros((N, E), np.int32)
            for i, r in enumerate(even_idx):
                eidx_np[i, : len(r)] = r
                eidx_np[i, len(r) :] = r[-1] if r else 0  # pad: repeat last
            vals_rows, blind_rows, txr_even = commit_rows(
                [(i, j) for i in range(N) for j in eidx_np[i]]
            )
            com_vals = shard_batch(
                mesh, _pk_scalars(fo, vals_rows).reshape(N, E, BK, -1)
            )
            com_blinds = shard_batch(
                mesh, _pk_scalars(fo, blind_rows).reshape(N, E, BK, -1)
            )
        _pack_b.__exit__(None, None, None)

        with stage("phase_b.device"):
            if flat:
                b = _PHASE_B_FLAT(
                    self.tabs, a["T"], a["D"],
                    a["TC"][..., 0, :, :], a["TC"][..., 1, :, :],
                    a["pkC"][..., 0, :, :], a["pkC"][..., 1, :, :],
                    jnp.asarray(a["T_v"][0]),
                    pkxv_r, pkyv_r, pkyr_r, txr_e,
                    com_vals, com_blinds, jnp.asarray(srcid),
                )
            else:
                b = self.phase_b(
                    self.tabs, a["T"], a["D"],
                    a["TC"][..., 0, :, :], a["TC"][..., 1, :, :],
                    a["pkC"][..., 0, :, :], a["pkC"][..., 1, :, :],
                    jnp.asarray(a["T_v"][0]),
                    pack_o([c[0] for c in pk_coords]),
                    pack_o([c[1] for c in pk_coords]),
                    pack_o(pky_r),
                    shard_batch(
                        mesh, _pk_scalars(fo, txr_even).reshape(N, E, -1)
                    ),
                    com_vals, com_blinds,
                    shard_batch(mesh, jnp.asarray(eidx_np)),
                )
            # async dispatch: device->host copies are queued immediately
            # (they run on the DMA engines behind the phase-B compute) and
            # the GK membership stage below does its host prep + device
            # dispatch while phase B computes and its outputs stream back
            # - the ~45 MB uint8 transfer was a 13% serial stage at N=256
            # through the dev tunnel (VERDICT r4 weak/next #2).
            for leaf in jax.tree.leaves(b):
                leaf.copy_to_host_async()

        # ---- batched GK membership (device d-values; tape order per
        # instance: after the exp draws, matching zkpAttestList.ts:141-142).
        # Dispatched BEFORE the phase-B unpack so it overlaps the transfer.
        from .batch_gk import batch_prove_membership

        tsc = tomEdwards256.new_scalar
        gk_proofs = batch_prove_membership(
            params.proof_group,
            [Commitment(pkX_pts[i], tsc(pkx_r[i])) for i in range(N)],
            whichs,
            keys,
            [t.source for t in tapes],
            mesh=mesh,
            dev=self.dev,
            timer=timer,
        )

        with stage("phase_b.unpack"):
            # Valid rows in row-major order correspond 1:1 (same
            # (i, ascending j) order) to the True entries of even_mask,
            # so ``pos`` maps (i, j) to a row of the unpack arrays - for
            # the flat layout the valid rows are simply the first K_real,
            # for [N, E] the first cnt[i] entries of each instance.  The
            # five combo slots (C7/C9/C12/CIX/CIY) are hash inputs only:
            # serialized to bytes below, never unpacked to ints.
            emask = np.asarray(even_mask)  # [N, 80]
            pos = np.full((N, SECPARAM), -1, np.int64)
            pos[emask] = np.arange(int(emask.sum()))
            if flat:
                ints = [
                    _unp(fo, np.asarray(v)[:K_real]) for v in b["ints"]
                ]  # 7 x [K_real]
                ex = np.asarray(b["tom_aff"][0])[:K_real]  # [K, NSLOT, L]
                ey = np.asarray(b["tom_aff"][1])[:K_real]
            else:
                sel = np.arange(E)[None, :] < cnt[:, None]  # [N, E]
                ints = [_unp(fo, np.asarray(v)[sel]) for v in b["ints"]]
                ex = np.asarray(b["tom_aff"][0])[sel]
                ey = np.asarray(b["tom_aff"][1])[sel]
            tom_x = _unp(tom_ops.f, ex[:, : BK + 8])
            tom_y = _unp(tom_ops.f, ey[:, : BK + 8])

        # ---- sub-proof Fiat-Shamir (pointAdd.ts:116, mult.ts:116,
        # equality.ts:66): all K_even * 6 challenges in one threaded hash
        # batch over the device affine bytes
        with stage("subproof.hash"):
            from .fiat_shamir import challenge_rows, point_bytes

            K_even = ex.shape[0]
            pb = point_bytes(tom_ops.f, ex, ey, 33).reshape(K_even, NSLOT, 67)
            g_b = np.broadcast_to(
                np.frombuffer(params.proof_group.g.to_bytes(), np.uint8),
                (K_even, 67),
            )
            S = _SLOT

            def sl(name, off=0):
                return pb[:, S[name] + off]

            def mult_msg(cx, cy, cz, jj):
                return [cx, cy, cz] + [
                    sl(nm, jj) for nm in ("C4", "Ax", "Ay", "Az", "A41", "A42")
                ]

            c_pi8 = challenge_rows(mult_msg(sl("C7"), sl("C8"), g_b, 0))
            c_pi10 = challenge_rows(mult_msg(sl("C8"), sl("C9"), sl("C10"), 1))
            c_pi11 = challenge_rows(mult_msg(sl("C10"), sl("C10"), sl("C11"), 2))
            c_pix = challenge_rows(
                [sl("C11"), sl("CIX"), sl("A1", 0), sl("A2", 0)]
            )
            c_pi13 = challenge_rows(mult_msg(sl("C10"), sl("C12"), sl("C13"), 3))
            c_piy = challenge_rows(
                [sl("C13"), sl("CIY"), sl("A1", 1), sl("A2", 1)]
            )

        def tom_pt_at(i, j, slot):
            k = pos[i, j] * (BK + 8) + slot
            return _tom_pt(tom_x[k], tom_y[k])

        # ---- assemble exp proofs per instance/round ----
        _asm = stage("assembly")
        _asm.__enter__()
        S_C4, S_Ax, S_Ay, S_Az, S_A41, S_A42 = (
            _SLOT["C4"], _SLOT["Ax"], _SLOT["Ay"], _SLOT["Az"],
            _SLOT["A41"], _SLOT["A42"],
        )
        S_A1, S_A2 = _SLOT["A1"], _SLOT["A2"]
        proofs = []
        for i in range(N):
            exp_proofs = []
            for j in range(SECPARAM):
                k = pos[i, j]  # even-round row in the masked unpack arrays
                A_p = A_pts[i][j]
                Tx_p = TxC_pts[i][j]
                Ty_p = TyC_pts[i][j]
                if not even_mask[i][j]:
                    exp_proofs.append(
                        ExpProof(
                            A_p, Tx_p, Ty_p,
                            alpha=p256.new_scalar(alpha[i][j]),
                            beta1=p256.new_scalar(r_rnd[i][j]),
                            beta2=tsc(txr[i][j]),
                            beta3=tsc(tyr[i][j]),
                        )
                    )
                    continue
                # even bit: point-add sub-proof assembly.  Pure integer
                # arithmetic: the challenges were batch-hashed above from
                # device affine bytes and every blinding combination is a
                # mod-order int - the former per-round Commitment algebra
                # (host EC adds) and per-sub-proof hash_points are gone.
                i7, i8, i9, i10, i11, i12, i13 = (v[k] for v in ints)
                C8p = tom_pt_at(i, j, _SLOT["C8"])
                C10p = tom_pt_at(i, j, _SLOT["C10"])
                C11p = tom_pt_at(i, j, _SLOT["C11"])
                C13p = tom_pt_at(i, j, _SLOT["C13"])
                # blinding scalars (ints mod t_ord) of the commitments and
                # their homomorphic combinations (pointAdd.ts:124-138)
                px_r, py_r = tape_b["t1x_r"][i][j], tape_b["t1y_r"][i][j]
                qx_r, qy_r = pkx_r[i], pky_r[i]
                rx_r, ry_r = txr[i][j], tyr[i][j]
                C7r = (qx_r - px_r) % t_ord
                C9r = (qy_r - py_r) % t_ord
                C12r = (px_r - rx_r) % t_ord
                cintXr = (rx_r + px_r + qx_r) % t_ord
                cintYr = (ry_r + py_r) % t_ord
                C8r = tape_b["c8_r"][i][j]
                C10r = tape_b["c10_r"][i][j]
                C11r = tape_b["c11_r"][i][j]
                C13r = tape_b["c13_r"][i][j]

                # hoisted row locals: the nested list/dict chains were a
                # visible slice of the assembly stage at N=256
                kx_r, ky_r, kz_r = kx[i][j], ky[i][j], kz[i][j]
                axr_r, ayr_r, azr_r = axr[i][j], ayr[i][j], azr[i][j]
                a41r_r, keq_r = a41r[i][j], keq[i][j]
                a1r_r, a2r_r = a1r[i][j], a2r[i][j]
                base_k = pos[i, j] * (BK + 8)

                def pt_at(slot, _b=base_k):
                    k_ = _b + slot
                    return _tom_pt(tom_x[k_], tom_y[k_])

                def mk_mult(jj, c, x, y, zv, rx, ry, rz):
                    r4 = ry * x  # Cy.r * x (mult.ts:105 auxiliary blinding)
                    return MultProof(
                        pt_at(S_C4 + jj), pt_at(S_Ax + jj), pt_at(S_Ay + jj),
                        pt_at(S_Az + jj), pt_at(S_A41 + jj), pt_at(S_A42 + jj),
                        tsc(kx_r[jj] - c * x),
                        tsc(ky_r[jj] - c * y),
                        tsc(kz_r[jj] - c * zv),
                        tsc(axr_r[jj] - c * rx),
                        tsc(ayr_r[jj] - c * ry),
                        tsc(azr_r[jj] - c * rz),
                        tsc(a41r_r[jj] - c * r4),
                    )

                def mk_eq(jj, c, x, r1, r2):
                    return EqualityProof(
                        pt_at(S_A1 + jj), pt_at(S_A2 + jj),
                        tsc(keq_r[jj] - c * x),
                        tsc(a1r_r[jj] - c * r1),
                        tsc(a2r_r[jj] - c * r2),
                    )

                pi8 = mk_mult(0, c_pi8[k], i7, i8, 1, C7r, C8r, 0)
                pi10 = mk_mult(1, c_pi10[k], i8, i9, i10, C8r, C9r, C10r)
                pi11 = mk_mult(2, c_pi11[k], i10, i10, i11, C10r, C10r, C11r)
                pix = mk_eq(0, c_pix[k], i11, C11r, cintXr)
                pi13 = mk_mult(3, c_pi13[k], i10, i12, i13, C10r, C12r, C13r)
                piy = mk_eq(1, c_piy[k], i13, C13r, cintYr)
                pa = PointAddProof(
                    C8p, C10p, C11p, C13p, pi8, pi10, pi11, pi13, pix, piy
                )
                exp_proofs.append(
                    ExpProof(
                        A_p, Tx_p, Ty_p,
                        z=p256.new_scalar(zvals[i][j]),
                        z2=p256.new_scalar((r_rnd[i][j] - com_r[i]) % n_ord),
                        proof=pa,
                        r1=tsc(tape_b["t1x_r"][i][j]),
                        r2=tsc(tape_b["t1y_r"][i][j]),
                    )
                )

            proofs.append(
                SignatureProofList(
                    R_pts[i], com_pts[i], pkX_pts[i], pkY_pts[i],
                    exp_proofs, gk_proofs[i],
                )
            )
        _asm.__exit__(None, None, None)
        return proofs


def batched_prove_signature_list(
    params: SystemParametersList,
    msg_hashes: Sequence[bytes],
    sig_bytes: Sequence[bytes],
    public_keys_raw: Sequence[bytes],
    whichs: Sequence[int],
    keys: list[int],
    tapes: Optional[Sequence[rng.RandomSource]] = None,
) -> list[SignatureProofList]:
    return BatchProver(params).prove(
        msg_hashes, sig_bytes, public_keys_raw, whichs, keys, tapes
    )
