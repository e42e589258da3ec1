"""MFU / roofline ladder for the streams train step (VERDICT r3 #3).

For each qubit count, measure the full jitted train step (sample ->
streams residual -> 3-term loss -> grad -> Adam) on the real chip, pull
XLA's cost model for the compiled scan, and report:

- points/sec (the headline metric),
- model FLOPs/step and %-of-bf16-peak MFU,
- HBM bytes/step and %-of-peak bandwidth utilization,
- arithmetic intensity (FLOPs/byte) — v5e's roofline knee sits at
  197e12/819e9 ~ 240 FLOPs/byte: below that the step is HBM-bound,
  above it MXU-bound.

Writes artifacts/mfu_ladder.json. Run on the TPU chip:
    python scripts/mfu_ladder.py [--qubits 12,16] [--batch 1024,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def measure(n_qubits: int, batch: int, n_steps: int = 30) -> dict:
    import jax

    params, opt_state, scan = bench._build(True, batch, n_qubits=n_qubits)
    key = jax.random.PRNGKey(1)
    params, opt_state, losses = scan(params, opt_state, key, n_steps)
    float(jax.device_get(losses)[-1])  # sync
    times = []
    for trial in range(3):
        t0 = time.time()
        params, opt_state, losses = scan(
            params, opt_state, jax.random.fold_in(key, trial), n_steps
        )
        float(jax.device_get(losses)[-1])
        times.append((time.time() - t0) / n_steps)
    times.sort()
    dt = times[len(times) // 2]
    compiled = scan.lower(
        params, opt_state, jax.random.fold_in(key, 0), n_steps
    ).compile()
    rec = {
        "n_qubits": n_qubits,
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 2),
        "points_per_sec": round(batch / dt, 1),
    }
    rec.update(bench.roofline(compiled, n_steps, dt))
    # sequential-chain accounting (round-4 VERDICT #5): full-state ops per
    # evolve, before/after chain-shortening — the latency-bound step's
    # true cost metric
    fused = getattr(getattr(bench, "_last_model", None), "_fused", None)
    if fused is not None and hasattr(fused, "segment_stats"):
        rec["segment_stats"] = fused.segment_stats()
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", default="12,16")
    ap.add_argument("--batch", default="1024,256",
                    help="per-qubit-count batch sizes (parallel list)")
    ap.add_argument("--out", default="artifacts/mfu_ladder.json")
    ap.add_argument("--merge-ab", action="store_true",
                    help="measure each row twice: chain-shortening merge "
                         "passes on (default) and off "
                         "(QCPINN_BLOCK_MERGE=0) — the on-chip A/B for "
                         "docs/design.md §8.2")
    args = ap.parse_args()
    qs = [int(v) for v in args.qubits.split(",")]
    bs = [int(v) for v in args.batch.split(",")]
    if len(bs) == 1:
        bs = bs * len(qs)

    rows = []
    for n, b in zip(qs, bs):
        rec = measure(n, b)
        if args.merge_ab:
            os.environ["QCPINN_BLOCK_MERGE"] = "0"
            try:
                unmerged = measure(n, b)
            finally:
                del os.environ["QCPINN_BLOCK_MERGE"]
            rec["unmerged_ms_per_step"] = unmerged["ms_per_step"]
            rec["unmerged_segment_stats"] = unmerged.get("segment_stats")
            rec["merge_speedup"] = round(
                unmerged["ms_per_step"] / rec["ms_per_step"], 3)
        rows.append(rec)
        print(json.dumps(rec))

    out = {
        "command": " ".join(sys.argv),
        "peak_bf16_flops": bench.PEAK_BF16_FLOPS,
        "peak_hbm_bytes_per_sec": bench.PEAK_HBM_BYTES,
        "note": ("flops are XLA nominal (HIGHEST-precision f32 matmuls "
                 "additionally cost ~6 bf16 MXU passes each); roofline "
                 "knee ~240 FLOPs/byte"),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
