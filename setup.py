"""Build hooks for the native point-generation library.

The C++ library (native/pointgen.cpp) is a plain ctypes shared object —
not a CPython extension — so it is compiled with a direct g++ invocation
into nsfnet_tpu/_native/ where data/native.py's loader finds it. Every
native entry point has a NumPy fallback, so a missing compiler degrades
to a warning, never a failed install.

    python setup.py build_native   # explicit
    pip install .                  # runs automatically via build_py
"""

import os
import shutil
import subprocess
import sys

from setuptools import Command, setup
from setuptools.command.build_py import build_py as _build_py

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "pointgen.cpp")
OUT_DIR = os.path.join(HERE, "nsfnet_tpu", "_native")
OUT = os.path.join(OUT_DIR, "libpointgen.so")


def compile_native() -> bool:
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("clang++")
    if cxx is None or not os.path.exists(SRC):
        print("nsfnet-tpu: no C++ compiler found; using the NumPy "
              "sampling fallback", file=sys.stderr)
        return False
    os.makedirs(OUT_DIR, exist_ok=True)
    cmd = [cxx, "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
           SRC, "-o", OUT]
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError as e:
        print(f"nsfnet-tpu: native build failed ({e}); using the NumPy "
              "sampling fallback", file=sys.stderr)
        return False
    return True


class build_native(Command):
    description = "compile native/pointgen.cpp into nsfnet_tpu/_native/"
    user_options = []

    def initialize_options(self):
        pass

    def finalize_options(self):
        pass

    def run(self):
        compile_native()


class build_py(_build_py):
    def run(self):
        compile_native()
        super().run()


setup(cmdclass={"build_native": build_native, "build_py": build_py})
