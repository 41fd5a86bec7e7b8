"""Lazy g++ build of the native helpers, cached next to the sources.

No pybind11 in this image — we use a plain C ABI + ctypes (see cluster.py).
"""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent


def _source_digest(src: Path) -> str:
    return hashlib.sha256(src.read_bytes()).hexdigest()[:16]


def build_library(name: str, extra_flags: tuple[str, ...] = ()) -> Path:
    """Compile <name>.cc -> lib<name>-<digest>.so (cached by source digest)."""
    src = _NATIVE_DIR / f"{name}.cc"
    if not src.exists():
        raise FileNotFoundError(src)
    digest = _source_digest(src)
    out = _NATIVE_DIR / f"lib{name}-{digest}.so"
    if out.exists():
        return out
    # drop stale builds
    for old in _NATIVE_DIR.glob(f"lib{name}-*.so"):
        old.unlink(missing_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        *extra_flags, str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"native build failed: {' '.join(cmd)}\n{e.stderr}") from e
    return out
