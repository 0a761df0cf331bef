"""Small helpers (reference src/util.ts)."""


def cmp_array(x, y) -> bool:
    return len(x) == len(y) and all(a.eq(b) for a, b in zip(x, y))
