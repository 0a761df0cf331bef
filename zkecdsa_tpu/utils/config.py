"""Configuration (SURVEY section 5 "config/flag system").

The reference exposes one knob (secLevel, default 80;
reference src/zkpAttestList.ts:88) plus compile-time curve constants.  The
TPU framework has genuinely more surface: batch sizes, mesh shape, field
backend, round budgets - collected here as one dataclass with env-var
overrides (``ZKECDSA_*``)."""

from __future__ import annotations

import dataclasses
import os

__all__ = ["Config", "get_config", "set_config"]


@dataclasses.dataclass
class Config:
    # protocol
    sec_level: int = 80  # prover rounds (zkpAttestList.ts:88)
    verify_rounds: int = 20  # top-level verifier spot-checks (":177")
    # batching
    batch_size: int = 16
    msm_pad: int = 64  # MSM term padding bucket
    # device
    mesh_dp: int = 1
    mesh_ring: int = 1
    # observability
    profile_dir: str | None = None

    @classmethod
    def from_env(cls) -> "Config":
        """Defaults overridden by ``ZKECDSA_<FIELD>`` env vars; int-typed
        fields are parsed, everything else is taken as a string."""
        cfg = cls()
        for field in dataclasses.fields(cls):
            env = os.environ.get("ZKECDSA_" + field.name.upper())
            if env is None:
                continue
            is_int = field.type in ("int", int) or isinstance(
                getattr(cfg, field.name), int
            )
            setattr(cfg, field.name, int(env) if is_int else env)
        return cfg


_config = Config.from_env()


def get_config() -> Config:
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg
