"""Native (C++) runtime components, built on demand with g++.

The compute path is JAX/XLA on TPU; these are host-side runtime pieces the
reference implements in C++ (mesh IO, scene preprocessing) and that are
worth keeping native for large meshes and per-frame trajectory export.

Build: `native/diffcloth_native.cpp` is compiled once into
`native/build/libdiffcloth_native.so` on first import (cached by source
mtime).  Everything degrades gracefully — callers fall back to the NumPy
implementations when no toolchain is available.
"""
from __future__ import annotations

import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "diffcloth_native.cpp")
_BUILD = os.path.join(_NATIVE_DIR, "build")
_SO = os.path.join(_BUILD, "libdiffcloth_native.so")


def _ensure_built() -> str:
    if not os.path.exists(_SRC):
        raise FileNotFoundError(_SRC)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def available() -> bool:
    try:
        _ensure_built()
        return True
    except Exception:
        return False
