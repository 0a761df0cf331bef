"""Pedersen commitments (layer L2, reference src/commit/pedersen.ts).

A commitment to v with blinding r is C = r*H + v*G; the ``Commitment``
wrapper carries (point, blinding) and is homomorphic under add/sub/scalar
mul, which the point-addition proof exploits to recombine committed
coordinates (pointAdd.ts:137-161).
"""

from __future__ import annotations

from ..bignum import big
from ..curves.group import Group, Point, Scalar

__all__ = ["Commitment", "PedersenParams", "generate_pedersen_params"]


class Commitment:
    """(point, blinding scalar) pair with homomorphic ops
    (pedersen.ts:21-36)."""

    __slots__ = ("p", "r")

    def __init__(self, p: Point, r: Scalar) -> None:
        self.p = p
        self.r = r

    def add(self, c: "Commitment") -> "Commitment":
        return Commitment(self.p.add(c.p), self.r.add(c.r))

    def sub(self, c: "Commitment") -> "Commitment":
        return Commitment(self.p.sub(c.p), self.r.sub(c.r))

    def mul(self, k: int) -> "Commitment":
        sk = self.p.group.new_scalar(k)
        return Commitment(self.p.mul(sk), self.r.mul(sk))


class PedersenParams:
    """Commitment bases (g, h) over group c (pedersen.ts:40-59)."""

    __slots__ = ("c", "g", "h")

    def __init__(self, c: Group, g: Point, h: Point) -> None:
        self.c = c
        self.g = g
        self.h = h

    def eq(self, o: "PedersenParams") -> bool:
        return self.c.eq(o.c) and self.g.eq(o.g) and self.h.eq(o.h)

    def commit(self, value: int) -> Commitment:
        """C = r*h + v*g with fresh random blinding r (pedersen.ts:53-58).
        Evaluated with Shamir double-mult; the batched TPU prover computes
        the same r*h + v*g on limb arrays (ops/curve_ops)."""
        r = self.c.random_scalar()
        v = self.c.new_scalar(value)
        return Commitment(self.h.dblmul(r, self.g, v), r)

    def commit_with_blinding(self, value: int, r: Scalar) -> Commitment:
        """Deterministic commit used by the batched prover after drawing the
        random tape up front."""
        v = self.c.new_scalar(value)
        return Commitment(self.h.dblmul(r, self.g, v), r)


def generate_pedersen_params(c: Group, g: Point | None = None) -> PedersenParams:
    """h = r*g for random r, matching the reference's (flagged) setup
    (pedersen.ts:61-69; its own comment notes h should be derived without a
    known dlog - we keep wire-compatible behavior; a hash-to-curve hardened
    mode can be layered on later without protocol changes)."""
    if g is None:
        g = c.generator()
    r = c.random_scalar()
    return PedersenParams(c, g, g.mul(r))
