"""Curve layer: SFC generators, rectangle generalizers, LUT factories.

Host-side, numpy-only (SURVEY.md section 2a).  Everything downstream of
this package consumes static int32 LUTs.
"""

from .generators import (
    CURVE_REGISTRY,
    curve_cells,
    hilbert_curve,
    moore_curve,
    onion_curve,
    peano_curve,
    raster_curve,
    z_curve,
)
from .generalize import (
    block_stitch_sfc,
    embed_and_prune_sfc,
    get_symmetries,
    grid_size,
)
from .hamiltonian import find_hamiltonian_path, refine_curve_to_hamiltonian
from .luts import (
    curve_coords,
    flat_lut,
    flat_lut_2d,
    inverse_permutation,
    onion_cells,
    onion_flat_lut,
    pixel_lut,
)
from .metrics import (
    clustering_number,
    compare_generalizers,
    segment_stats,
    sweep_generalizers,
)

__all__ = [
    "CURVE_REGISTRY",
    "curve_cells",
    "hilbert_curve",
    "moore_curve",
    "onion_curve",
    "peano_curve",
    "raster_curve",
    "z_curve",
    "block_stitch_sfc",
    "embed_and_prune_sfc",
    "get_symmetries",
    "grid_size",
    "find_hamiltonian_path",
    "refine_curve_to_hamiltonian",
    "curve_coords",
    "flat_lut",
    "flat_lut_2d",
    "inverse_permutation",
    "onion_cells",
    "onion_flat_lut",
    "pixel_lut",
    "clustering_number",
    "compare_generalizers",
    "segment_stats",
    "sweep_generalizers",
]
