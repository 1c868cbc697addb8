"""Execution-probe the flash forward's scoped-VMEM fit across geometry.

Motivation: the dtype-aware ``_fwd_block_q_cap`` (ops/flash_attention.py)
models only the Mosaic live logits PAIR — the measured anchor behind it
is (bq=512, bk=4096, fp32, dh=32) = 16.91 MiB actual vs the 16.0 MiB
pair model, i.e. ~0.9 MiB of residual (q/k/v/o tiles + lane scratch) at
dh=32.  That residual GROWS with dh (the k/v tiles are bk*dh each), so
larger-head configs could be latently over budget while riding the
remote compile cache (see CLAUDE.md "latent-OOM" note).  This probe
RUNS the chooser-selected config for every (N, dh, dtype, lse) corner
at the single-K-step boundary (tiny batch, scalar readback) and records
fit / Mosaic scoped-vmem overflow, giving measured anchors for any cap
extension instead of a speculative additive model.

Harness notes (measured 2026-08-19):
  * ``.lower().compile()`` over the remote axon backend does NOT run
    the Mosaic kernel compile — the known-OOM uncapped (512, 4096,
    fp32) config "compiles" clean in 1.9 s.  Mosaic only compiles on
    first EXECUTION, so the probe executes every row.
  * Grid EXTENTS change Mosaic's buffer allocation: the same uncapped
    config compiles fine at (b=1, h=1) (grid (1, 8, 1), 456 s fresh
    compile) and fails at the study's (b=8, h=4) (grid (32, 8, 1),
    extent-1 axes evidently skip double-buffering).  Rows therefore
    run at b=8, h=4 — the realistic training-grid shape.
  * Failures surface as an opaque ``HTTP 500: tpu_compile_helper
    subprocess exit code 1`` from the remote-compile tunnel, not a
    clean Mosaic scoped-vmem message — classified ``compile_failed``.
  * A NEGATIVE CONTROL row (the measured-OOM uncapped config) runs
    FIRST and must fail, or the whole run is invalid.
  * Each row runs in its own subprocess: a failed compile must not be
    able to wedge the backend connection for the rows after it.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_vmem_probe.py > /tmp/r4_vmem_probe.log 2>&1 &
"""

import json
import subprocess
import sys

OUT = "results/r4_flash_fwd_vmem_probe.json"

_ONE = r"""
import json, re, sys, time
import jax, jax.numpy as jnp
import numpy as np
from sfc_vit_tpu.ops import flash_attention as fa

n, dh, dtname, lse, uncapped = json.loads(sys.argv[1])
dtype = jnp.dtype(dtname)
assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(0)
B, H = 8, 4  # realistic training grid extents (see module docstring)
mk = lambda: jnp.asarray(rng.standard_normal((B, n, H, dh)) / 8, dtype)
q, k, v = mk(), mk(), mk()
bq0 = fa._auto_block_q(n)
bk = fa._auto_block_k(n)
bq = bq0 if uncapped else fa._fwd_block_q_cap(bq0, bk, dtype)
if uncapped:
    fa._fwd_block_q_cap = lambda b, kk, d: b
t0 = time.time()
try:
    out = fa._flash_fwd(q, k, v, 1.0, block_q=bq0, return_lse=lse)
    out = out[0] if lse else out
    val = float(out[0, 0, 0, 0])  # scalar readback forces execution
    status, detail = "ok", f"out[0,0,0,0]={val:.4f}"
except Exception as e:
    msg = str(e)
    m = re.search(r"[sS]coped\s+vmem[^\n]{0,120}", msg)
    if m or "vmem" in msg.lower():
        status = "vmem_overflow"
    elif "tpu_compile_helper" in msg or "remote_compile" in msg:
        status = "compile_failed"
    else:
        status = "error"
    detail = (m.group(0) if m else msg.splitlines()[0])[:220]
print("ROW " + json.dumps({
    "n": n, "dh": dh, "dtype": dtname, "with_lse": lse,
    "block_q_auto": bq0, "block_q_run": bq, "block_k": bk,
    "negative_control": uncapped, "status": status, "detail": detail,
    "wall_s": round(time.time() - t0, 1),
}))
"""


def run_row(n, dh, dtname, lse, uncapped=False, timeout=900):
    arg = json.dumps([n, dh, dtname, lse, uncapped])
    try:
        p = subprocess.run(
            [sys.executable, "-c", _ONE, arg],
            capture_output=True, text=True, timeout=timeout,
        )
        for line in p.stdout.splitlines():
            if line.startswith("ROW "):
                return json.loads(line[4:])
        tail = (p.stdout + p.stderr).splitlines()[-1:] or ["<no output>"]
        return {"n": n, "dh": dh, "dtype": dtname, "with_lse": lse,
                "negative_control": uncapped, "status": "proc_error",
                "detail": tail[0][:220]}
    except subprocess.TimeoutExpired:
        return {"n": n, "dh": dh, "dtype": dtname, "with_lse": lse,
                "negative_control": uncapped, "status": "timeout",
                "detail": f">{timeout}s"}


def main():
    rows = []
    # Negative control first: the measured-OOM uncapped config must be
    # caught, or the harness is not exercising Mosaic and every later
    # "ok" is meaningless.
    ctl = run_row(4096, 32, "float32", True, uncapped=True)
    rows.append(ctl)
    print(json.dumps(ctl), flush=True)
    if ctl["status"] == "ok":
        print("NEGATIVE CONTROL DID NOT FAIL — aborting probe")
        with open(OUT, "w") as f:
            json.dump({"probe": "flash fwd scoped-VMEM fit (INVALID: "
                       "negative control passed)", "rows": rows}, f,
                      indent=1)
        return
    # The single-K-step boundary (N=4096) is where the logits tile is
    # largest — probe every (dh, dtype) corner there with the
    # training-path LSE output (plus two no-LSE inference rows).  Two
    # streamed (bk=1024) rows at N=8192/dh=128 and one crossover row at
    # N=2048/dh=128/fp32 sanity-check the regimes where the pair model
    # says there is ample headroom.  The fp32 boundary sweep maps where
    # UNDEMOTED bq=512 single-K-step configs stop fitting as bk grows
    # through (3584..3968] — the current cap only demotes at bk > 3968
    # (review round 4: 8*512*3968 == 15.5 MiB exactly, strict '>').
    grid = [(4096, dh, dt, True)
            for dh in (32, 64, 128)
            for dt in ("float32", "bfloat16")]
    grid += [(4096, 32, "float32", False), (4096, 32, "bfloat16", False)]
    grid += [(8192, 128, "float32", True),
             (8192, 128, "bfloat16", True),
             (2048, 128, "float32", True)]
    grid += [(n, dh, "float32", True)
             for n in (3584, 3712, 3840, 3896, 3968)
             for dh in (32, 64)]
    for n, dh, dt, lse in grid:
        r = run_row(n, dh, dt, lse)
        rows.append(r)
        print(json.dumps(r), flush=True)
    with open(OUT, "w") as f:
        json.dump({"probe": "flash fwd scoped-VMEM fit, chooser configs"
                   " (executed per-subprocess; negative control caught)",
                   "rows": rows}, f, indent=1)
    bad = [r for r in rows[1:] if r["status"] != "ok"]
    print(f"done: {len(rows) - 1} configs, {len(bad)} over budget")


if __name__ == "__main__":
    main()
