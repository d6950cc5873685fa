"""Packaging for hpfrec_tpu.

The reference package (``/root/reference/setup.py:33-258``) subclasses
``build_ext`` to probe compiler flags (``-march=native``, LTO, eight
OpenMP flag spellings) and swap in a no-OpenMP fallback when the probe
fails.  Here the equivalent probing lives in
``hpfrec_tpu/_native/build.py`` and runs lazily on first import, so the
package itself is pure Python and installs anywhere — including
machines with no C++ toolchain, where the host data layer falls back to
numpy/scipy transparently (``hpfrec_tpu/utils/data.py``).

This setup.py additionally tries to warm the native build at install
time so the first ``fit`` doesn't pay the ~1 s compile; failure is
non-fatal by design (same philosophy as the reference's OpenMP
fallback, ``setup.py:171-174``).
"""

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_warm_native(build_py):
    def run(self):
        super().run()
        try:
            import sys

            sys.path.insert(0, self.build_lib)
            from hpfrec_tpu._native.build import build_native

            build_native(verbose=True)
        except Exception as e:  # no toolchain: numpy fallback paths take over
            print(f"note: native host kernels not prebuilt ({e!r}); "
                  "they will be built on first use or numpy fallbacks used")


setup(cmdclass={"build_py": build_py_warm_native})
