"""Headline benchmark: collocation points/sec for a FULL training step of the
12-qubit cross_mesh DV solver on convection-diffusion (the BASELINE.json
metric) on the real TPU chip.

One step = sample -> classical-quantum-classical forward -> PDE residual
(second-order autodiff through the simulator) -> weighted 3-term loss ->
grad -> clip -> Adam -> plateau scheduler, identical in structure to the
reference's hot loop (trainer/diffusion_train.py:30-89).

vs_baseline divides by a *measured* reference-equivalent CPU throughput:
scripts/baseline_torch_cpu.py implements the same step with a raw torch
complex-einsum statevector simulator (strictly faster than the reference's
PennyLane default.qubit QNode path) and measured 10.5 residual-points/sec on
this machine (torch 2.x, 1 CPU core, B=256). Using a conservative baseline
understates the speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

BASELINE_PTS_PER_SEC = 10.5  # scripts/baseline_torch_cpu.py on this machine


def main():
    import jax

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import gaussian_pulse_samplers
    from qcpinn_tpu.models import DVSolver
    from qcpinn_tpu.physics import diffusion_operator
    from qcpinn_tpu.train import diffusion_terms, make_train_step
    from qcpinn_tpu.train import optim as topt

    batch = 256
    cfg = QCPINNConfig(
        num_qubits=12,
        num_quantum_layers=1,
        q_ansatz="cross_mesh",
        classic_network=(3, 50, 1),
        batch_size=batch,
        lr=5e-3,
        seed=42,
    )
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))

    optimizer = topt.make_optimizer(cfg.lr, grad_clip=cfg.effective_grad_clip)
    opt_state = optimizer.init(params)
    sched = topt.plateau_init()

    samplers = gaussian_pulse_samplers()
    terms = diffusion_terms(samplers, batch)
    _, scan_steps = make_train_step(
        model.apply, diffusion_operator, terms, optimizer, cfg
    )

    key = jax.random.PRNGKey(1)
    n_steps = 50
    # compile + warmup with the SAME static n_steps as the timed calls;
    # device_get of a scalar is the only reliable hard sync on the
    # experimental axon platform (block_until_ready can return early).
    out = scan_steps(params, opt_state, sched, key, 0, n_steps)
    float(jax.device_get(out[3]["loss"])[-1])

    times = []
    for trial in range(3):
        t0 = time.time()
        out = scan_steps(
            out[0], out[1], out[2], key, (trial + 1) * n_steps, n_steps
        )
        float(jax.device_get(out[3]["loss"])[-1])
        times.append((time.time() - t0) / n_steps)
    times.sort()
    dt = times[len(times) // 2]  # median

    pts_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "collocation points/sec, 12-qubit cross_mesh QCPINN train step",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / BASELINE_PTS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
