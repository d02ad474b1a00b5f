"""Build the native scan-loader library: `python -m lv_slam_tpu.native.build`."""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "scan_loader.cpp")
LIBRARY = os.path.join(_DIR, "libscanloader.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(LIBRARY) and os.path.getmtime(LIBRARY) >= os.path.getmtime(SOURCE):
        return LIBRARY
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", SOURCE, "-o", LIBRARY,
    ]
    subprocess.run(cmd, check=True)
    return LIBRARY


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
