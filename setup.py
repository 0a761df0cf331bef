"""Build the C++ runtime (zkecdsa_tpu/runtime/native.cpp) as part of the
package install, so `pip install` ships the threaded SHA-256 batch +
getrandom CSPRNG instead of silently falling back to hashlib/secrets
(VERDICT r4 missing #4).

The library is a plain shared object loaded via ctypes (no CPython API,
no PyInit_*), so the build_ext override pins the artifact name to the
exact filename ``runtime/native.py`` looks for (libzkruntime.so) instead
of the versioned extension suffix.  The ctypes loader keeps its lazy
self-build fallback for source checkouts, so a failed toolchain degrades
to hashlib rather than breaking the install.
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class PlainSharedLib(build_ext):
    def get_ext_filename(self, fullname):
        if fullname.endswith("libzkruntime"):
            return os.path.join(*fullname.split(".")) + ".so"
        return super().get_ext_filename(fullname)

    def get_export_symbols(self, ext):
        # no PyInit_* - ctypes library, not an importable module
        return ext.export_symbols


setup(
    ext_modules=[
        Extension(
            "zkecdsa_tpu.runtime.libzkruntime",
            sources=["zkecdsa_tpu/runtime/native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread", "-fPIC"],
            extra_link_args=["-pthread"],
        )
    ],
    cmdclass={"build_ext": PlainSharedLib},
)
