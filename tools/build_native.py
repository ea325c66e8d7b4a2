#!/usr/bin/env python
"""Build the native data-plane library (csrc/dataio.cpp -> libdataio.so).

Run once per machine: `python tools/build_native.py`. The Python side
(diffusion_tpu/data/native.py) falls back to pure Python when the .so is
absent, so this is an optimization, not a requirement.

Links libjpeg(-turbo) when available for the native JPEG->square-tensor
decode path (jpeg_decode_square); otherwise builds without it and that
entry point reports unavailable (PIL fallback).
"""

from __future__ import annotations

import os
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "csrc", "dataio.cpp")
OUT = os.path.join(ROOT, "diffusion_tpu", "data", "libdataio.so")


def build() -> str:
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    try:
        subprocess.run(base[:-2] + ["-DHAVE_JPEG", "-o", OUT, "-ljpeg"],
                       check=True, capture_output=True)
        return OUT + " (with libjpeg)"
    except subprocess.CalledProcessError as e:
        print("libjpeg build failed, falling back to no-JPEG build:\n"
              + e.stderr.decode(errors="replace")[-2000:])
    subprocess.run(base, check=True)
    return OUT + " (no libjpeg)"


if __name__ == "__main__":
    print(build())
