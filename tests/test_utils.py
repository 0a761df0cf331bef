"""Config / profiling / rng seam tests."""

import jax.numpy as jnp

from zkecdsa_tpu.utils import rng
from zkecdsa_tpu.utils.config import Config
from zkecdsa_tpu.utils.profiling import StageTimer, kernel_ns_per_op


def test_deterministic_rng_replays():
    with rng.deterministic(1):
        a = rng.random_bytes(16)
    with rng.deterministic(1):
        b = rng.random_bytes(16)
    assert a == b
    with rng.deterministic(2):
        c = rng.random_bytes(16)
    assert a != c


def test_scoped_source_restores():
    base = rng.get_source()
    with rng.scoped(rng.DeterministicSource(3)) as s:
        assert rng.get_source() is s
    assert rng.get_source() is base


def test_config_defaults():
    cfg = Config()
    assert cfg.sec_level == 80
    assert cfg.verify_rounds == 20  # zkpAttestList.ts:177 behavior


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_kernel_ns_per_op():
    f = lambda x: x + 1
    ns = kernel_ns_per_op(f, (jnp.arange(128),), n_ops=128, iters=3, warmup=1)
    assert ns > 0
