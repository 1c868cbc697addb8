"""Device meshes and sharding rules.

The reference is strictly single-GPU (SURVEY.md section 2f: no
torch.distributed anywhere); distribution here is new capability designed
the TPU way: a ``jax.sharding.Mesh`` over ("data", "model") axes, batch
sharded over "data", parameters either replicated or sharded over
"model" for the wide dimensions, and XLA inserting the collectives.

Multi-host: call :func:`init_distributed` once per process before mesh
creation; device order from ``jax.devices()`` keeps ICI-adjacent chips
adjacent on the mesh axes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "global_batch_from_local",
    "host_shard_slice",
    "param_sharding_rules",
    "apply_param_sharding",
    "fsdp_sharding_rules",
    "apply_fsdp_sharding",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.

    Initializes when a coordinator is named OR ``num_processes > 1``
    OR the cluster auto-detect env (``JAX_COORDINATOR_ADDRESS``) is
    set — ``jax.distributed.initialize`` fills unspecified values from
    the environment.  Explicit ``num_processes=1`` (or calling with no
    arguments outside a cluster) is the single-process no-op.
    """
    import os

    if num_processes == 1:
        return
    if (
        coordinator_address is not None
        or (num_processes is not None and num_processes > 1)
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data: int = -1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model", "pipe") mesh.

    ``data=-1`` consumes all remaining devices.  For a single device this
    degenerates to a 1x1x1 mesh, so the same jitted train step runs
    unchanged from 1 chip to a pod slice.  Size-1 axes are free: specs
    that never mention "pipe" behave exactly as on the old 2-axis mesh.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if data == -1:
        assert n % (model * pipe) == 0, (
            f"{n} devices not divisible by model*pipe={model * pipe}"
        )
        data = n // (model * pipe)
    assert data * model * pipe == n, (
        f"mesh {data}x{model}x{pipe} != {n} available devices"
    )
    return Mesh(
        devs.reshape(data, model, pipe), (DATA_AXIS, MODEL_AXIS, PIPE_AXIS)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard a (x, y, ...) tuple over the batch (data) axis.

    Single process: a plain ``device_put``.  Multi-host: ``batch`` is
    this process's LOCAL shard of the global batch — the production
    pipeline shards hosts with the STRIDED split in
    :func:`~sfc_vit_tpu.data.datasets.epoch_batches`
    (``order[process_index::process_count]``); the local arrays are
    stitched into one global ``jax.Array`` via
    ``make_array_from_process_local_data``, which only moves each
    host's data to its own devices (no cross-host gather).  The global
    batch is the process-order concatenation of the local ones
    (:func:`host_shard_slice` is the alternative CONTIGUOUS split for
    pipelines that materialize the global batch first).
    """
    if jax.process_count() > 1:
        return global_batch_from_local(mesh, batch)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def global_batch_from_local(mesh: Mesh, local_batch):
    """Assemble a data-sharded global batch from per-process shards.

    Works in single-process mode too (the local batch IS the global
    batch), which is how the hermetic suite exercises the multi-host
    code path on the 8-virtual-device CPU mesh.
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        # pass device-resident leaves through as-is: np.asarray on a
        # jax.Array is a full device->host readback (an HTTP round trip
        # per step on the remote backend — the exact cost the on-device
        # augment path exists to avoid, cli.py)
        lambda a: jax.make_array_from_process_local_data(
            sh, a if isinstance(a, jax.Array) else np.asarray(a)
        ),
        local_batch,
    )


def host_shard_slice(n: int) -> slice:
    """This process's contiguous slice of an n-sample global batch.

    Multi-host input pipelines index their (identically ordered,
    identically seeded) dataset view with this slice so the
    process-order concatenation reassembles the global batch that a
    single-host run would have produced.  ``n`` must divide evenly.
    """
    pc, pi = jax.process_count(), jax.process_index()
    if n % pc:
        raise ValueError(
            f"global batch {n} not divisible by process_count={pc}"
        )
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def param_sharding_rules(value, model_size: int) -> P:
    """Shape-based tensor-parallel rule for transformer params.

    2-D matrices shard their widest divisible dimension over "model";
    everything else replicates.  Being a pure function of shape, the same
    rule applies consistently to params *and* their optimizer-state
    mirrors (Adam mu/nu), which is what makes whole-TrainState sharding
    trivial.  With model=1 every spec degenerates to replication.
    """
    shape = getattr(value, "shape", ())
    if len(shape) == 2:
        d_in, d_out = shape
        if d_out >= d_in and d_out % model_size == 0:
            return P(None, MODEL_AXIS)
        if d_in % model_size == 0:
            return P(MODEL_AXIS, None)
    return P()


def apply_param_sharding(mesh: Mesh, tree):
    """NamedShardings for an arbitrary pytree via the shape rule."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(mesh, param_sharding_rules(v, model_size)),
        tree,
    )


def fsdp_sharding_rules(value, data_size: int, model_size: int = 1) -> P:
    """ZeRO-3-style fully-sharded rule, composable with tensor parallel.

    Starts from the TP shape rule (when ``model_size > 1``), then shards
    the LARGEST remaining unsharded dimension of every >=2-D tensor over
    "data" when divisible.  Applied uniformly to params and their Adam
    mirrors, each device holds ``1/data`` of the weights and optimizer
    state; under ``jit`` XLA inserts the all-gathers for compute and
    reduce-scatters for gradients (the pjit formulation of FSDP — no
    wrapper module, just shardings).  1-D vectors and scalars replicate:
    their bytes are negligible and sub-lane collectives cost more than
    they save.
    """
    shape = getattr(value, "shape", ())
    base = param_sharding_rules(value, model_size) if model_size > 1 else P()
    if data_size <= 1 or len(shape) < 2:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    free = [
        i for i in range(len(shape))
        if spec[i] is None and shape[i] % data_size == 0
    ]
    if not free:
        return base
    spec[max(free, key=lambda j: shape[j])] = DATA_AXIS
    return P(*spec)


def apply_fsdp_sharding(mesh: Mesh, tree):
    """NamedShardings for a pytree (e.g. a whole TrainState) under the
    FSDP rule: weights + optimizer state sharded over "data" (and, on a
    2-D mesh, additionally over "model" via the TP rule)."""
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(
            mesh, fsdp_sharding_rules(v, data_size, model_size)
        ),
        tree,
    )
