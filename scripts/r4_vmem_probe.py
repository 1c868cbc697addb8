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
  * A NEGATIVE CONTROL row (that same uncapped config) runs FIRST and
    must come back ``vmem_overflow``, or the whole run is invalid.
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
q = jnp.asarray(rng.standard_normal((1, n, 1, dh)) / 8, dtype)
bq0 = fa._auto_block_q(n)
bk = fa._auto_block_k(n)
bq = bq0 if uncapped else fa._fwd_block_q_cap(bq0, bk, dtype)
if uncapped:
    fa._fwd_block_q_cap = lambda b, k, d: b
t0 = time.time()
try:
    out = fa._flash_fwd(q, q, q, 1.0, block_q=bq0, return_lse=lse)
    out = out[0] if lse else out
    val = float(out[0, 0, 0, 0])  # scalar readback forces execution
    status, detail = "ok", f"out[0,0,0,0]={val:.4f}"
except Exception as e:
    msg = str(e)
    m = re.search(r"[sS]coped\s+vmem[^\n]{0,120}", msg)
    status = "vmem_overflow" if "vmem" in msg.lower() else "error"
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
    if ctl["status"] != "vmem_overflow":
        print("NEGATIVE CONTROL DID NOT OVERFLOW — aborting probe")
        with open(OUT, "w") as f:
            json.dump({"probe": "flash fwd scoped-VMEM fit (INVALID: "
                       "negative control passed)", "rows": rows}, f,
                      indent=1)
        return
    # The single-K-step boundary (N=4096) is where the logits tile is
    # largest — probe every (dh, dtype, lse) corner there.  Two streamed
    # (bk=1024) rows at N=8192/dh=128 and one crossover row at
    # N=2048/dh=128/fp32 sanity-check the regimes where the pair model
    # says there is ample headroom.
    grid = [(4096, dh, dt, lse)
            for dh in (32, 64, 128)
            for dt in ("float32", "bfloat16")
            for lse in (False, True)]
    grid += [(8192, 128, "float32", True),
             (8192, 128, "bfloat16", True),
             (2048, 128, "float32", True)]
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
