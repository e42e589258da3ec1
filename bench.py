"""Headline benchmark: collocation points/sec for a FULL training step of the
12-qubit cross_mesh QCPINN on convection-diffusion (the BASELINE.json
metric) on the real TPU chip.

One step = sample -> classical-quantum-classical forward -> PDE residual
(second derivatives through the simulator) -> weighted 3-term loss ->
grad -> clip -> Adam, identical in structure to the reference's hot loop
(trainer/diffusion_train.py:30-89).

Fast path: tangent-stream residuals (physics/streams.py — circuit linearity
turns all derivative streams into one 6x-wider batched forward) composed
with the Pallas reverse-sweep evolution kernel (ops/pallas_sv.py). Falls
back to the nested-autodiff XLA path if the fused backend is unavailable.

vs_baseline divides by a *measured* reference-equivalent CPU throughput:
scripts/baseline_torch_cpu.py implements the same step with a raw torch
complex-einsum statevector simulator (strictly faster than the reference's
PennyLane default.qubit QNode path) and measured 10.5 residual-points/sec on
this machine (torch 2.x CPU, B=256). Using a conservative baseline
understates the speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

BASELINE_PTS_PER_SEC = 10.5  # scripts/baseline_torch_cpu.py on this machine

# TPU v5e (v5 lite) public per-chip peaks: 197 TFLOP/s bf16 matmul,
# 819 GB/s HBM bandwidth. The roofline denominators for MFU / HBM-util.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


def roofline(compiled, n_steps: int, dt: float) -> dict:
    """MFU / HBM-utilization from XLA's own cost model for the compiled
    scan (VERDICT r3 #3: graduate perf claims from x-CPU to roofline
    terms). ``flops`` is XLA's nominal executed-HLO count — with
    Precision.HIGHEST the MXU additionally runs ~6 bf16 passes per f32
    matmul, so the bf16-peak MFU understates hardware occupancy by that
    factor (documented in PARITY.md)."""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / n_steps
        bytes_ = float(ca.get("bytes accessed", 0.0)) / n_steps
    except Exception:  # noqa: BLE001 - cost model availability varies
        return {}
    if flops <= 0 or dt <= 0:
        return {}
    return {
        "flops_per_step": flops,
        "mfu_pct_bf16_peak": round(100.0 * flops / dt / PEAK_BF16_FLOPS, 2),
        "hbm_util_pct": round(100.0 * bytes_ / dt / PEAK_HBM_BYTES, 1),
        "arith_intensity_flops_per_byte": round(flops / max(bytes_, 1.0), 1),
    }


def _build(use_pallas: bool, batch: int, n_qubits: int = 12):
    import jax
    import jax.numpy as jnp
    import optax

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    cfg = QCPINNConfig(
        num_qubits=n_qubits,
        num_quantum_layers=1,
        q_ansatz="cross_mesh",
        classic_network=(3, 50, 1),
        batch_size=batch,
        lr=5e-3,
        seed=42,
    )
    global _last_model
    model = DVFourierSolver(cfg)
    _last_model = model  # introspection hook (scripts/mfu_ladder.py)
    if use_pallas:
        import os

        # A/B knob for on-chip backend experiments: auto (block at 12q) |
        # block | loop | unrolled
        model.use_pallas(backend=os.environ.get("QCPINN_BENCH_BACKEND", "auto"))
        if model._fused is None:
            raise RuntimeError("pallas unavailable")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
    opt_state = optimizer.init(params)

    box = dd._box
    res_s = dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true)
    bc_s = dd.Sampler(box([[0, 0, 0], [1, 0, 1]]), dd.u)
    ic_s = dd.Sampler(box([[0, 0, 0], [0, 1, 1]]), dd.u)
    third = max(batch // 3, 1)

    def step(carry, key):
        params, opt_state = carry
        k1, k2, k3 = jax.random.split(key, 3)
        Xr, yr = res_s.sample(k1, batch)
        Xb, yb = bc_s.sample(k2, third)
        Xi, yi = ic_s.sample(k3, third)

        def loss_fn(p):
            _, r = dv_diffusion_residual_streams(model, p, Xr)
            # one apply for both value terms: the step is latency-bound on
            # the circuit chain (PARITY round-4 roofline study), so each
            # extra model.apply costs a full chain traversal
            pv = model.apply(p, jnp.concatenate([Xb, Xi], axis=0))
            return (
                2.0 * jnp.mean((r - yr) ** 2)
                + 4.0 * jnp.mean((pv[: Xb.shape[0]] - yb) ** 2)
                + 2.0 * jnp.mean((pv[Xb.shape[0]:] - yi) ** 2)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    import os

    if os.environ.get("QCPINN_BENCH_MODE") == "stepjit":
        # A/B probe: one jitted step, host loop (async dispatch), sync at
        # the end — the Cz pipeline measured whole-epoch lax.scan compiling
        # 6.8x slower than the identical per-step jit on v5e
        step_j = jax.jit(lambda c, k: step(c, k))

        def scan(params, opt_state, key, n):
            keys = jax.random.split(key, n)
            carry = (params, opt_state)
            for i in range(n):
                carry, loss = step_j(carry, keys[i])
            return carry[0], carry[1], loss[None]

        return params, opt_state, scan

    @functools.partial(jax.jit, static_argnums=(3,))
    def scan(params, opt_state, key, n):
        keys = jax.random.split(key, n)
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
        return params, opt_state, losses

    return params, opt_state, scan


def main():
    import os

    import jax

    batch = int(os.environ.get("QCPINN_BENCH_BATCH", "1024"))
    n_steps = 30
    for use_pallas in (True, False):
        try:
            params, opt_state, scan = _build(use_pallas, batch)
            key = jax.random.PRNGKey(1)
            params, opt_state, losses = scan(params, opt_state, key, n_steps)
            float(jax.device_get(losses)[-1])  # hard sync (axon platform)
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
            pts = batch / dt
            record = {
                "metric": "collocation points/sec, 12-qubit cross_mesh QCPINN train step"
                + ("" if use_pallas else " (xla fallback)"),
                "value": round(pts, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts / BASELINE_PTS_PER_SEC, 1),
            }
            if os.environ.get("QCPINN_BENCH_MODE") != "stepjit":
                compiled = scan.lower(
                    params, opt_state, jax.random.fold_in(key, 0), n_steps
                ).compile()
                record.update(roofline(compiled, n_steps, dt))
            print(json.dumps(record))
            return
        except Exception as e:  # noqa: BLE001 - fall back to the XLA path
            import sys

            print(f"# pallas path failed ({str(e)[:80]}); falling back", file=sys.stderr)
    raise SystemExit("both bench paths failed")


if __name__ == "__main__":
    main()
