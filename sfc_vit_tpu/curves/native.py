"""ctypes loader for the native (C++) curve runtime.

Builds ``csrc/hamiltonian.cpp`` into a shared library on first use (g++,
cached next to the source) and exposes it with the same signature as the
Python solver.  Falls back to the pure-Python implementation when no
compiler is available; path results are identical (pinned by
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Cell = Tuple[int, int]

__all__ = [
    "native_available",
    "find_hamiltonian_path_native",
    "refine_curve_to_hamiltonian_native",
]

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB_NAME = "libsfc_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _CSRC / "hamiltonian.cpp"
        if not src.exists():
            return None
        out = _CSRC / _LIB_NAME
        if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
            # compile to a private temp path then atomically publish:
            # the in-process lock does not cover OTHER processes (e.g.
            # parallel pytest workers), and a concurrent dlopen of a
            # half-written .so would poison this process's fallback for
            # its whole lifetime.
            tmp = out.with_suffix(f".tmp.{os.getpid()}.so")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(tmp), str(src)],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, out)
            except (OSError, subprocess.SubprocessError):
                tmp.unlink(missing_ok=True)
                return None
        try:
            lib = ctypes.CDLL(str(out))
        except OSError:
            return None
        lib.sfc_find_hamiltonian_path.restype = ctypes.c_int
        lib.sfc_find_hamiltonian_path.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _build_and_load() is not None


def find_hamiltonian_path_native(
    width: int,
    height: int,
    adjacency_order: Optional[Dict[Cell, int]] = None,
    diag: bool = False,
) -> Optional[List[Cell]]:
    """Native drop-in for :func:`sfc_vit_tpu.curves.find_hamiltonian_path`.

    Returns None both when no path exists and (transparently falling back
    to Python) when the native library cannot be built.
    """
    lib = _build_and_load()
    if lib is None:
        from .hamiltonian import find_hamiltonian_path

        return find_hamiltonian_path(width, height, adjacency_order, diag)

    total = width * height
    prio_ptr = None
    start = 0
    prio_arr = None
    if adjacency_order:
        prio_arr = np.full(total, total, dtype=np.int64)
        for (x, y), score in adjacency_order.items():
            if 0 <= x < width and 0 <= y < height:
                prio_arr[x * height + y] = score
        start_cell = min(adjacency_order, key=adjacency_order.get)
        sx, sy = start_cell
        if not (0 <= sx < width and 0 <= sy < height):
            # the C++ search would write visited[start] out of bounds
            # (heap corruption); the Python solver raises for the same
            # input, so fail loudly here too
            raise ValueError(
                f"adjacency_order start cell {start_cell} outside the "
                f"{width}x{height} grid"
            )
        start = sx * height + sy
        prio_ptr = prio_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    out = np.empty(2 * total, dtype=np.int32)
    n = lib.sfc_find_hamiltonian_path(
        width, height, prio_ptr, start, int(diag),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n == 0:
        return None
    pts = out.reshape(total, 2)
    return [tuple(p) for p in pts.tolist()]


def refine_curve_to_hamiltonian_native(
    curve: Sequence[Cell], width: int, height: int
) -> Optional[List[Cell]]:
    priority = {tuple(pt): idx for idx, pt in enumerate(curve)}
    return find_hamiltonian_path_native(
        width, height, adjacency_order=priority
    )
