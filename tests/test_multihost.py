"""Real multi-process parallelism: 2 processes x 2 CPU devices.

The single-process suite covers the 8-virtual-device mesh; these tests
run the SAME production helpers across an actual process boundary
(``jax.distributed`` + Gloo collectives, the CPU stand-in for a 2-host
TPU job) and pin three facts, in three modes (``dp`` = replicated
params + cross-process gradient all-reduce, ``fsdp`` = ZeRO-3
params/Adam sharded over the same axis so per-step all-gathers cross
the process boundary + a distributed Orbax round-trip, ``pp`` =
Trainer --pipeline-parallel 4 with the GPipe ppermute stage ring
spanning both processes, ``sp`` = attn_impl='ring' sequence parallelism
with the K/V ppermute ring spanning both processes):

* both processes compute identical losses and updated params
  (deterministic, replica-consistent training);
* the multi-process run matches a single-process run on the same global
  batch (host sharding + cross-process collectives change nothing);
* ``init_distributed`` / ``host_shard_slice`` /
  ``global_batch_from_local`` / ``apply_fsdp_sharding`` compose into a
  working multi-host step (the path ``cli.py`` takes under real
  multi-host launch).

Reference baseline: none — SURVEY.md §2f records the reference as
strictly single-GPU with no torch.distributed anywhere; this capability
axis is new.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp, mode):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers size their own virtual-device count
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    ckpt_dir = str(tmp / "ckpt")  # shared by both processes (fsdp mode)
    for pid in range(2):
        out = tmp / f"{mode}_w{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), "2", str(port),
                 str(out), mode, ckpt_dir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-2000:]}"
    return [json.loads(o.read_text()) for o in outs]


def _run_single(tmp, mode):
    """Same worker, nproc=1 (4 local devices): the pp reference run."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = tmp / f"{mode}_ref.json"
    p = subprocess.Popen(
        [sys.executable, WORKER, "0", "1", str(port), str(out), mode],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    log = p.communicate(timeout=420)[0].decode()
    assert p.returncode == 0, f"reference worker failed:\n{log[-2000:]}"
    return json.loads(out.read_text())


@pytest.fixture(scope="module", params=["dp", "fsdp", "pp", "sp"])
def multihost_results(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    res = _run_workers(tmp, request.param)
    if request.param in ("pp", "sp"):
        # parity reference: identical worker code, no process boundary
        # (the Trainer config needs exactly 4 devices, so the
        # in-process 8-device suite can't be the reference).
        res.append(_run_single(tmp, request.param))
    return res


@pytest.fixture(scope="module")
def single_process_reference():
    """Same model/batch/steps with no process boundary."""
    import jax

    from sfc_vit_tpu.models import SimpleViT
    from sfc_vit_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
        warmup_cosine,
    )

    model = SimpleViT(
        image_size=16, patch_size=4, num_classes=10, dim=32, depth=1,
        heads=2, mlp_dim=64, dim_head=16,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    y = (np.arange(8) % 10).astype(np.int32)
    sched = warmup_cosine(1e-3, 2, 10)
    state = create_train_state(
        model, jax.random.key(0), x[:2], make_optimizer(sched)
    )
    step = jax.jit(make_train_step(num_classes=10, schedule=sched))
    key = jax.random.key(1)
    losses = []
    for i in range(2):
        state, m = step(state, (x, y), jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    digest = float(
        sum(
            np.abs(np.asarray(l, np.float64)).sum()
            for l in jax.tree_util.tree_leaves(state.params)
        )
    )

    # eval over the SAME 7-sample set the workers shard between hosts
    from sfc_vit_tpu.training import make_eval_step

    rng2 = np.random.default_rng(7)
    ex = rng2.integers(0, 256, (7, 16, 16, 3)).astype(np.float32) / 255.0
    ey = (np.arange(7) % 10).astype(np.int32)
    m = jax.device_get(
        jax.jit(make_eval_step(num_classes=10))(state, (ex, ey))
    )
    eval_totals = {
        "loss_sum": float(m["loss_sum"]),
        "correct": int(m["correct"]),
        "count": int(m["count"]),
    }
    return losses, digest, eval_totals


def test_processes_agree(multihost_results):
    r0, r1 = multihost_results[:2]
    assert r0["ndev"] == r1["ndev"] == 4
    assert r0["losses"] == r1["losses"]
    assert r0["digest"] == r1["digest"]
    assert r0["eval"] == r1["eval"]
    if r0["ckpt_digest"] is not None:  # fsdp: distributed Orbax round-trip
        assert r0["ckpt_digest"] == r0["digest"]
        assert r1["ckpt_digest"] == r1["digest"]


def test_matches_single_process(multihost_results, single_process_reference):
    """Same global batch, no process boundary -> same training run."""
    r0 = multihost_results[0]
    if len(multihost_results) == 3:  # pp/sp: reference is the nproc=1 worker
        ref = multihost_results[2]
        np.testing.assert_allclose(r0["losses"], ref["losses"], rtol=1e-6)
        np.testing.assert_allclose(r0["digest"], ref["digest"], rtol=1e-7)
        return
    losses, digest, eval_totals = single_process_reference
    np.testing.assert_allclose(r0["losses"], losses, rtol=1e-6)
    np.testing.assert_allclose(r0["digest"], digest, rtol=1e-7)
    if r0["eval"] is not None:  # dp mode: strided-pad eval accounting
        assert r0["eval"]["count"] == eval_totals["count"] == 7
        assert r0["eval"]["correct"] == eval_totals["correct"]
        np.testing.assert_allclose(
            r0["eval"]["loss_sum"], eval_totals["loss_sum"], rtol=1e-5
        )
