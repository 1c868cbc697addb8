"""Native (C++) Hamiltonian solver: exact path parity with Python."""

import time

import pytest

from sfc_vit_tpu.curves import embed_and_prune_sfc, find_hamiltonian_path
from sfc_vit_tpu.curves.native import (
    find_hamiltonian_path_native,
    native_available,
    refine_curve_to_hamiltonian_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


@needs_native
@pytest.mark.parametrize("wh", [(4, 4), (5, 5), (4, 6), (5, 3), (7, 7)])
def test_native_matches_python_unguided(wh):
    w, h = wh
    assert find_hamiltonian_path_native(w, h) == find_hamiltonian_path(w, h)


@needs_native
@pytest.mark.parametrize("curve", ["hilbert", "z", "moore"])
@pytest.mark.parametrize("wh", [(5, 5), (6, 4), (7, 7), (8, 8)])
def test_native_matches_python_guided(curve, wh):
    w, h = wh
    guide = embed_and_prune_sfc(curve, w, h)
    prio = {tuple(p): i for i, p in enumerate(guide)}
    want = find_hamiltonian_path(w, h, adjacency_order=prio)
    got = refine_curve_to_hamiltonian_native(guide, w, h)
    assert got == want


@needs_native
def test_native_is_faster_on_large_grid():
    guide = embed_and_prune_sfc("hilbert", 16, 16)
    prio = {tuple(p): i for i, p in enumerate(guide)}
    t0 = time.perf_counter()
    native = find_hamiltonian_path_native(16, 16, adjacency_order=prio)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    python = find_hamiltonian_path(16, 16, adjacency_order=prio)
    t_python = time.perf_counter() - t0
    assert native == python
    assert len(native) == 256
    # informational speedup bound: native should not be slower
    assert t_native <= t_python
