"""sfc_vit_tpu: a TPU-native framework for space-filling-curve Vision
Transformers (JAX / XLA / Pallas / pjit).

Re-designed TPU-first with the capabilities of the reference
``RemcoHoger/Space-Filling-Curves-for-Vision-Transformers``:

* ``curves``      -- host-side SFC generators -> static int32 LUTs
* ``tokenizers``  -- image -> curve-ordered token sequences (flax)
* ``models``      -- ViT encoder families (flax)
* ``ops``         -- Pallas TPU kernels with XLA fallbacks
* ``training``    -- jitted train/eval steps, optax, Orbax checkpointing
* ``parallel``    -- device meshes, shardings, collectives
* ``data``        -- input pipelines and on-device augmentations
* ``serving``     -- AOT-compiled fixed-shape inference (+ int8 weights)
"""

__version__ = "0.1.0"

from . import curves  # noqa: F401  (host-side, import is cheap)
