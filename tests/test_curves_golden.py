"""Golden-vector tests: curve orderings bit-exact vs the reference.

The fixtures in tests/golden/curves_golden.npz were extracted once from
``/root/reference/src/curves/space_filling_curves.py`` and the reference
tokenizers; these tests pin our generators to them (SURVEY.md section 4).
"""

import numpy as np
import pytest

from sfc_vit_tpu.curves import (
    flat_lut_2d,
    CURVE_REGISTRY,
    block_stitch_sfc,
    curve_cells,
    embed_and_prune_sfc,
    find_hamiltonian_path,
    flat_lut,
    onion_cells,
    pixel_lut,
    refine_curve_to_hamiltonian,
)

GRID = {"hilbert": lambda o: 2 ** o, "moore": lambda o: 2 ** o,
        "z": lambda o: 2 ** o, "peano": lambda o: 3 ** o,
        "onion": lambda o: 2 * o, "raster": lambda o: 2 ** o}


@pytest.mark.parametrize("name", ["hilbert", "moore", "z", "peano", "onion", "raster"])
def test_generator_cells_bit_exact(golden, name):
    orders = [1, 2, 3] if name == "peano" else [1, 2, 3, 4]
    for o in orders:
        want = golden[f"cells_{name}_o{o}"]
        got = curve_cells(name, o)
        np.testing.assert_array_equal(got, want, err_msg=f"{name} order {o}")


def test_known_sequences():
    # SURVEY.md section 2a verified sequences.
    h = curve_cells("hilbert", 2)
    assert h[:5].tolist() == [[0, 0], [1, 0], [1, 1], [0, 1], [0, 2]]
    assert h[-1].tolist() == [3, 0]
    z = curve_cells("z", 2)
    assert z[:6].tolist() == [[3, 0], [2, 0], [3, 1], [2, 1], [1, 0], [0, 0]]


@pytest.mark.parametrize("name", ["hilbert", "moore", "z", "peano", "onion"])
@pytest.mark.parametrize("wh", [(7, 7), (12, 12), (7, 5), (5, 9)])
def test_embed_and_prune_bit_exact(golden, name, wh):
    w, h = wh
    want = golden[f"ep_{name}_{w}x{h}"]
    got = np.asarray(embed_and_prune_sfc(name, w, h), dtype=np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["hilbert", "z", "peano", "moore"])
@pytest.mark.parametrize("wh", [(12, 12), (7, 5), (10, 13)])
def test_block_stitch_bit_exact(golden, name, wh):
    w, h = wh
    want = golden[f"bs_{name}_{w}x{h}"]
    got, blocked = block_stitch_sfc(name, w, h)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int32), want)
    assert sum(len(b) for b in blocked) == len(got)


@pytest.mark.parametrize("wh", [(4, 4), (5, 5), (4, 6)])
def test_hamiltonian_bit_exact(golden, wh):
    w, h = wh
    want = golden[f"ham_{w}x{h}"]
    got = np.asarray(find_hamiltonian_path(w, h), dtype=np.int32)
    np.testing.assert_array_equal(got, want)


def test_hamiltonian_refined_bit_exact(golden):
    guide = embed_and_prune_sfc("hilbert", 6, 6)
    got = refine_curve_to_hamiltonian(guide, 6, 6)
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.int32), golden["ham_refined_hilbert_6x6"]
    )


def test_flat_lut_matches_reference_tokenizers(golden):
    # SFCEmbedding1D morton flat LUTs (r*n + c).
    for grid in [8, 16, 32]:
        np.testing.assert_array_equal(
            flat_lut("morton", grid), golden[f"morton_flat_g{grid}"]
        )
    # altvit integer-arithmetic Hilbert LUT agrees with the float pipeline.
    for n in [4, 8, 16]:
        np.testing.assert_array_equal(
            flat_lut("hilbert", n), golden[f"altvit_flat_n{n}"]
        )
    # _2D HilbertEmbedding uses the *untransformed* curve -> transposed
    # convention; verified start [0, 8, 9, 1, ...].
    np.testing.assert_array_equal(
        flat_lut_2d("hilbert", 8), golden["hilbert2d_flat_g8"]
    )
    assert flat_lut_2d("hilbert", 8)[:4].tolist() == [0, 8, 9, 1]


def test_onion_spiral_bit_exact(golden):
    np.testing.assert_array_equal(onion_cells(8, 8), golden["onion_spiral_8x8"])
    np.testing.assert_array_equal(onion_cells(32, 32), golden["onion_spiral_32x32"])


@pytest.mark.parametrize("name", sorted(set(CURVE_REGISTRY) - {"onion"}))
def test_luts_are_permutations(name):
    for grid in [4, 8, 9, 16]:
        if name == "peano" and grid not in (9,):
            continue
        if name != "peano" and grid == 9:
            continue
        lut = flat_lut(name, grid)
        assert sorted(lut.tolist()) == list(range(grid * grid))


def test_pixel_lut_is_permutation():
    for name in ["hilbert", "morton", "onion", "raster"]:
        lut = pixel_lut(name, 32, 32)
        assert sorted(lut.tolist()) == list(range(32 * 32))


def test_hamiltonian_path_property():
    # Path visits every cell exactly once with unit (cardinal) steps.
    path = find_hamiltonian_path(5, 7)
    assert path is not None and len(set(path)) == 35
    for a, b in zip(path, path[1:]):
        assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


@pytest.mark.parametrize(
    "name,order",
    [("hilbert", 5), ("hilbert", 6), ("moore", 5), ("moore", 6),
     ("z", 5), ("z", 6), ("peano", 4)],
)
def test_generator_cells_high_orders(golden, name, order):
    np.testing.assert_array_equal(
        curve_cells(name, order), golden[f"cells_{name}_o{order}"]
    )


@pytest.mark.parametrize("name", ["hilbert", "z"])
@pytest.mark.parametrize("wh", [(28, 28), (14, 14), (33, 17)])
def test_generalizers_vitb_scale_grids(golden, name, wh):
    """ViT-relevant grids (14=B/16@224, 28, and a large odd rect)."""
    w, h = wh
    np.testing.assert_array_equal(
        np.asarray(embed_and_prune_sfc(name, w, h), dtype=np.int32),
        golden[f"ep_{name}_{w}x{h}"],
    )
    got, _ = block_stitch_sfc(name, w, h)
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.int32), golden[f"bs_{name}_{w}x{h}"]
    )
