"""Round-3 FINAL train A/B: saved-z MLP bwd + softmax-impl sweep.

One process, ViT-B/16 hilbert full train step (the r3_train_bwd_ab.py
protocol) at bs 64/128/256:

  * pallas+fp32     — Pallas backwards, saved-z MLP path, fp32 softmax
  * pallas+bf16exp  — same with bf16-exp softmax in the attention
                      kernels (fwd + bwd recompute)

Baseline for context (measured earlier, results/r3_train_bwd_ab.json):
pallas 978.7/1046.3/1071.5, xla 933.6/831.3/771.9.

    PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/r3_train_final_ab.py > /tmp/r3_final_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from r3_train_bwd_ab import train_throughput  # same harness

    import sfc_vit_tpu.ops.fused_attention_block as fab

    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    for sm in ("fp32", "bf16exp"):
        fab._SOFTMAX_IMPL = sm
        for batch in (64, 128, 256):
            ips = train_throughput(batch, "pallas")
            results[f"pallas_{sm}_bs{batch}"] = ips
            print(f"-> softmax={sm} bs={batch}: {ips:.1f}", flush=True)
    fab._SOFTMAX_IMPL = "fp32"
    with open("results/r3_train_final_ab.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
