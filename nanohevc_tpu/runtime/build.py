"""Build the native runtime shared library (lazy, cached).

g++ is invoked once per source change; the .so lands next to the
source with a content-hash stamp so rebuilds are automatic and cheap.
No pip/network involvement.
"""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent / "native"
_SRC = _NATIVE_DIR / "nanohevc_runtime.cpp"
_LIB = _NATIVE_DIR / "libnanohevc_runtime.so"
_STAMP = _NATIVE_DIR / ".build_hash"


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]


def build_runtime(force: bool = False) -> Path:
    """Compile (if needed) and return the shared library path."""
    h = _src_hash()
    if not force and _LIB.exists() and _STAMP.exists() and _STAMP.read_text() == h:
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-Wall",
        "-o",
        str(_LIB),
        str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    _STAMP.write_text(h)
    return _LIB
