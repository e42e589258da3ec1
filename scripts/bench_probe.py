"""Decomposition probe for the 12q/16q streams train step (round 4).

The roofline rows (artifacts/mfu_ladder.json) show the block-engine train
step at 0.05-0.13% of bf16 peak and 3-4% of HBM peak — neither
compute-bound nor bandwidth-bound by XLA's nominal counts. This script
locates the time: it measures, for one qubit count / batch,

  fwd        evolve+readout only (model.apply on the residual batch)
  streams    the 7-wide tangent-stream residual forward
  loss       full 3-term loss, no grad
  step       loss + grad + clip + Adam (the bench step)

for each backend (block / loop) and, for the block engine, a hi_bits and
precision sweep. Prints one JSON line per measurement.

Run on the TPU chip:  python scripts/bench_probe.py --qubits 12 --batch 1024
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.time() - t0) / n)
    times.sort()
    return times[len(times) // 2]


def build_model(n_qubits, backend, hi_bits=None, precision=None):
    import jax

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver

    cfg = QCPINNConfig(
        num_qubits=n_qubits,
        num_quantum_layers=1,
        q_ansatz="cross_mesh",
        classic_network=(3, 50, 1),
        seed=42,
    )
    model = DVFourierSolver(cfg)
    model.use_pallas(backend=backend)
    if model._fused is None:
        raise RuntimeError(f"backend {backend} unavailable")
    if backend == "block":
        if hi_bits is not None:
            from qcpinn_tpu.ops.block_fused import BlockFusedCircuit

            model._fused = BlockFusedCircuit(
                model._fused.circuit, hi_bits=hi_bits
            )
        if precision is not None:
            model._fused.precision = precision
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def probe(n_qubits, batch, backend, hi_bits=None, precision=None, stages="all"):
    import jax
    import jax.numpy as jnp
    import optax

    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    model, params = build_model(n_qubits, backend, hi_bits, precision)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(5e-3))
    opt_state = optimizer.init(params)

    box = dd._box
    res_s = dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true)
    bc_s = dd.Sampler(box([[0, 0, 0], [1, 0, 1]]), dd.u)
    ic_s = dd.Sampler(box([[0, 0, 0], [0, 1, 1]]), dd.u)
    third = max(batch // 3, 1)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    Xr, yr = res_s.sample(k1, batch)
    Xb, yb = bc_s.sample(k2, third)
    Xi, yi = ic_s.sample(k3, third)

    def loss_fn(p):
        _, r = dv_diffusion_residual_streams(model, p, Xr)
        return (
            2.0 * jnp.mean((r - yr) ** 2)
            + 4.0 * jnp.mean((model.apply(p, Xb) - yb) ** 2)
            + 2.0 * jnp.mean((model.apply(p, Xi) - yi) ** 2)
        )

    stage_fns = {
        "fwd": jax.jit(lambda p: model.apply(p, Xr)),
        "streams": jax.jit(lambda p: dv_diffusion_residual_streams(model, p, Xr)[1]),
        "loss": jax.jit(loss_fn),
        "grad": jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[1]),
    }

    @jax.jit
    def full_step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    wanted = stage_fns.keys() if stages == "all" else stages.split(",")
    rec = {
        "n_qubits": n_qubits,
        "batch": batch,
        "backend": backend,
        "hi_bits": hi_bits,
        "precision": str(precision) if precision is not None else "HIGHEST",
    }
    for name in wanted:
        if name == "step":
            continue
        try:
            rec[f"{name}_ms"] = round(_timed(stage_fns[name], params) * 1e3, 2)
        except Exception as e:  # noqa: BLE001
            rec[f"{name}_ms"] = f"failed: {str(e)[:60]}"
    if stages == "all" or "step" in stages:
        try:
            rec["step_ms"] = round(
                _timed(full_step, params, opt_state) * 1e3, 2
            )
        except Exception as e:  # noqa: BLE001
            rec["step_ms"] = f"failed: {str(e)[:60]}"
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=12)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--backends", default="block,loop")
    ap.add_argument("--hi-bits", default="",
                    help="comma list of hi_bits to sweep for the block engine")
    ap.add_argument("--default-precision", action="store_true",
                    help="also probe the block engine at Precision.DEFAULT")
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    import jax

    for backend in args.backends.split(","):
        probe(args.qubits, args.batch, backend, stages=args.stages)
    for hb in [int(v) for v in args.hi_bits.split(",") if v]:
        probe(args.qubits, args.batch, "block", hi_bits=hb, stages=args.stages)
    if args.default_precision:
        probe(
            args.qubits, args.batch, "block",
            precision=jax.lax.Precision.DEFAULT, stages=args.stages,
        )


if __name__ == "__main__":
    main()
