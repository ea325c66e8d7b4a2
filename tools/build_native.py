#!/usr/bin/env python
"""Build the native data-plane library (csrc/dataio.cpp -> libdataio.so).

Run once per machine: `python tools/build_native.py`. The Python side
(diffusion_tpu/data/native.py) falls back to pure Python when the .so is
absent, so this is an optimization, not a requirement.
"""

from __future__ import annotations

import os
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "csrc", "dataio.cpp")
OUT = os.path.join(ROOT, "diffusion_tpu", "data", "libdataio.so")


def build() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build())
