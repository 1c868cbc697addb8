"""Fill the crashed bf16exp sweep cells (round-4 VERDICT item 5).

results/r3_train_final_ab.json is missing pallas_bf16exp at bs 128/256
(the round-3 run aborted on a remote_compile HTTP flake).  Re-measures
ALL FOUR upper cells in ONE process — fp32 rows re-run too so the
fp32/bf16exp comparison is same-process (CLAUDE.md: cross-process
variance on the remote chip is +-2-3%) — then rewrites the results file
with the complete table (fp32 bs64 / bf16exp bs64 rows carried over,
marked with their provenance).

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r4_fill_bf16exp.py > /tmp/r4_fill_bf16exp.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from r3_train_bwd_ab import train_throughput

    import sfc_vit_tpu.ops.fused_attention_block as fab

    print(f"backend: {jax.default_backend()}", flush=True)
    path = "results/r3_train_final_ab.json"
    with open(path) as f:
        old = json.load(f)

    fresh = {}
    for sm in ("fp32", "bf16exp"):
        fab._SOFTMAX_IMPL = sm
        for batch in (128, 256):
            ips = train_throughput(batch, "pallas")
            fresh[f"pallas_{sm}_bs{batch}"] = ips
            print(f"-> softmax={sm} bs={batch}: {ips:.1f}", flush=True)
    fab._SOFTMAX_IMPL = "fp32"

    merged = {
        "note": (
            "bs128/bs256 rows (both softmax impls) re-measured in one "
            "process by scripts/r4_fill_bf16exp.py (round 4, filling "
            "the bf16exp cells the round-3 run lost to an HTTP flake); "
            "bs64 rows are the original round-3 same-process pair"
        ),
        "pallas_fp32_bs64": old["pallas_fp32_bs64"],
        "pallas_bf16exp_bs64": old["pallas_bf16exp_bs64"],
        **{k: round(v, 1) for k, v in fresh.items()},
        "round3_fp32_rows_for_reference": {
            "bs128": old["pallas_fp32_bs128"],
            "bs256": old["pallas_fp32_bs256"],
        },
        "baseline_round2_xla": old["baseline_round2_xla"],
        "intermediate_recompute_only": old["intermediate_recompute_only"],
    }
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(merged), flush=True)


if __name__ == "__main__":
    main()
