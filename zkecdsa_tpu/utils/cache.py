"""Persistent-compilation-cache setup shared by the test suite, bench
harness, and tools.

One non-obvious hazard, found the hard way (VERDICT r3 weak #1 and again
in round 4): JAX's cache writer compresses serialized executables with
the ``zstandard`` C extension when it is importable
(jax/_src/compilation_cache.py compress_executable), and that extension
segfaults deterministically on the multi-hundred-MB executables our
dp-sharded phase programs produce - reproduced solo, twice, on two
different tests.  ``zlib`` handles the same buffers fine (slower
compression, irrelevant next to multi-minute compiles), so
:func:`enable_persistent_cache` forces the zlib fallback by clearing the
module's ``zstandard`` handle before any cache write.

Old zstd-compressed entries in an existing cache dir simply miss (JAX
swallows cache read errors unless ``jax_raise_persistent_cache_errors``
is set - jax/_src/compiler.py) and are rewritten in zlib on the next
compile.
"""

from __future__ import annotations

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path: str, min_compile_secs: float = 0.5) -> None:
    """Point JAX's persistent compilation cache at ``path`` with the
    zstd-segfault workaround (see module docstring).  The directory must
    have a SINGLE process using it at a time: entries are not written
    atomically, and two concurrent JAX processes sharing a dir (two
    pytest runs, or pytest + bench.py) can corrupt each other's reads."""
    import jax
    from jax._src import compilation_cache as _cc

    _cc.zstandard = None  # force the zlib path (zstd segfaults, see above)
    if getattr(_cc, "zstd", None) is not None:  # Python 3.14+ stdlib zstd
        _cc.zstd = None
    _guard_multidevice_writes(_cc)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )


def _guard_multidevice_writes(_cc) -> None:
    """Take multi-device CPU programs entirely OUT of the persistent
    cache machinery.

    Round-4 findings (three suite crashes at the same test, each one
    layer deeper): (1) the zstd compressor is not the root cause -
    forcing zlib still crashed; (2) ``executable.serialize()`` in the
    cache writer segfaults on the dp-sharded CPU executables, so writes
    were guarded - and the suite STILL aborted, now inside
    ``backend_compile_and_load`` itself: with caching engaged,
    ``_resolve_compilation_strategy`` returns serialization-compatible
    compile options, and XLA:CPU aborts compiling the big 2-device
    programs under those options (solo run, 118 GB free - not OOM).
    The configuration that has always been green for this test is the
    cache-disabled compile path (round-3 verification), so that is what
    multi-device CPU programs get: ``cache_key=None`` -> plain compile,
    no altered options, no lookup, no write.  They are test-only
    programs; single-device and real-chip executables keep caching."""
    import inspect
    import logging

    import jax

    # The patch targets jax._src internals (verified against jax 0.9.x);
    # a JAX upgrade can rename the hook or change its contract silently.
    # Fail LOUDLY into the always-safe configuration (no persistent
    # cache) rather than running with a half-applied guard (advisor r4).
    try:
        from jax._src import compiler as _compiler

        orig = _compiler._resolve_compilation_strategy
        params = list(inspect.signature(orig).parameters)
        assert params[:4] == [
            "computation", "devices", "compile_options", "backend"
        ], params
    except Exception as exc:  # pragma: no cover - only on a JAX upgrade
        logging.getLogger(__name__).error(
            "zkecdsa_tpu cache guard: jax internals changed (%r on jax %s); "
            "disabling the persistent compilation cache entirely",
            exc, jax.__version__,
        )
        jax.config.update("jax_enable_compilation_cache", False)
        return
    if getattr(orig, "_zkecdsa_guard", False):
        return

    def resolve(computation, devices, compile_options, backend, *a, **k):
        if getattr(backend, "platform", "") == "cpu" and devices.size > 1:
            return None, compile_options
        return orig(computation, devices, compile_options, backend, *a, **k)

    resolve._zkecdsa_guard = True
    _compiler._resolve_compilation_strategy = resolve
