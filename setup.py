"""Install-time build of the native CPU oracle (plain C-ABI .so).

Mirrors the reference building its library at build time (reference:
CMakeLists.txt:9-16) instead of on first import.  Best-effort: on a
toolchain-less host the wheel still installs and every pure-JAX path
works; the oracle source ships inside the package so qoipp_tpu.oracle
can compile it on first use (into a user cache dir) as the fallback.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithOracle(build_py):
    def run(self):
        super().run()
        src = Path(__file__).resolve().parent / "native" / "qoi_ref.cpp"
        dest = Path(self.build_lib) / "qoipp_tpu" / "_native"
        dest.mkdir(parents=True, exist_ok=True)
        (dest / "__init__.py").write_text('"""Prebuilt native oracle."""\n')
        (dest / "qoi_ref.cpp").write_bytes(src.read_bytes())
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared",
            "-fPIC", str(src), "-o", str(dest / "libqoiref.so"),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(
                f"qoipp-tpu: oracle not prebuilt ({e!r}); "
                "it will compile on first use",
                file=sys.stderr,
            )


setup(cmdclass={"build_py": BuildWithOracle})
