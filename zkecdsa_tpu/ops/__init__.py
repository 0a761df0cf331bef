from .limbs import FieldCtx, P256_N, P256_P, TOM_N, TOM_P, WAR_P  # noqa: F401
