"""Build hook: compile the native C++ kernel library into the package.

The reference ships a Cython extension via setup.py; here the native
kernels (FLAC/WAV decode, DTW, beam search — native/*.cc) build into one
shared library, `make -C native`, and install as package data next to
cpc_audio_tpu/ops/native.py, which loads it via ctypes.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = os.path.dirname(os.path.abspath(__file__))
NATIVE_DIR = os.path.join(ROOT, "native")
LIB_NAME = "libcpc_native.so"


def build_native() -> str:
    subprocess.run(["make", "-C", NATIVE_DIR], check=True)
    return os.path.join(NATIVE_DIR, LIB_NAME)


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        lib = build_native()
        dest_dir = os.path.join(self.build_lib, "cpc_audio_tpu", "ops")
        os.makedirs(dest_dir, exist_ok=True)
        shutil.copy2(lib, os.path.join(dest_dir, LIB_NAME))
        # editable installs resolve the package in the source tree
        shutil.copy2(lib, os.path.join(ROOT, "cpc_audio_tpu", "ops",
                                       LIB_NAME))


setup(cmdclass={"build_py": BuildPyWithNative})
