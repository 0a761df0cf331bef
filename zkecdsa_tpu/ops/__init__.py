from .f32field import F32Field, P256_N, P256_P, TOM_N, TOM_P, WAR_P  # noqa: F401
from .curve_ops import (  # noqa: F401
    EdwardsOps,
    WeierOps,
    nibble_digits,
    p256_ops,
    tom_ops,
    war_ops,
)
