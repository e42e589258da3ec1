"""On-chip probe: block-einsum precision vs speed (VERDICT r3 #3 tail).

The block engine's complex64 einsums lower to 4 real f32 matmuls each, and
``Precision.HIGHEST`` makes every f32 matmul cost 6 bf16 MXU passes; HIGH
costs 3 passes at ~f32 accuracy (bf16x3), DEFAULT 1 pass (raw bf16). Since
the MFU ladder (artifacts/mfu_ladder.json) shows the 12q/16q steps far from
both roofline walls, the question is whether the matmul passes are on the
critical path at all — this measures it instead of guessing.

Checks, all on the real chip:
  1. forward <Z> deviation vs HIGHEST at 16q B=256 and 12q B=1024,
     for HIGH and DEFAULT, with timing;
  2. full streams train step (the ladder's workload) ms/step at
     12q B=1024 (bench config) and 16q B=256 (flagship probe),
     HIGHEST vs HIGH, plus 10-step loss trajectory deviation.

Writes artifacts/block_precision_onchip.json.
Run: python scripts/precision_probe.py
"""

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


def forward_rows(n_qubits, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qcpinn_tpu.ops.block_fused import _PRECISIONS, BlockFusedCircuit
    from qcpinn_tpu.ops.circuit import DVCircuit

    circ = DVCircuit(num_qubits=n_qubits, num_quantum_layers=1,
                     q_ansatz="cross_mesh")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_qubits),
                          jnp.float32)
    rows, ref = [], None
    for name in ("highest", "high", "default"):
        eng = BlockFusedCircuit(circ, precision=_PRECISIONS[name])
        f = jax.jit(lambda p, x, e=eng: e(p, x))
        z = np.asarray(f(params, x))
        if ref is None:
            ref = z
        rows.append({
            "check": f"forward {n_qubits}q B={batch} precision={name}",
            "max_abs_dev_vs_highest": float(np.max(np.abs(z - ref))),
            "ms": round(_timed(f, params, x) * 1e3, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def train_rows(n_qubits, batch):
    """The ladder's streams train-step workload, HIGHEST vs HIGH."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    def run(precision_name):
        os.environ["QCPINN_BLOCK_PRECISION"] = precision_name
        cfg = QCPINNConfig(num_qubits=n_qubits, num_quantum_layers=1,
                           q_ansatz="cross_mesh",
                           classic_network=(3, 50, 1), seed=42)
        model = DVFourierSolver(cfg)
        model.use_pallas(backend="block")
        params = model.init(jax.random.PRNGKey(0))
        optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adam(5e-3))
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
                return (2.0 * jnp.mean((r - yr) ** 2)
                        + 4.0 * jnp.mean((model.apply(p, Xb) - yb) ** 2)
                        + 2.0 * jnp.mean((model.apply(p, Xi) - yi) ** 2))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        @functools.partial(jax.jit, static_argnums=(3,))
        def scan(params, opt_state, key, n_):
            keys = jax.random.split(key, n_)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, opt_state, losses

        key = jax.random.PRNGKey(1)
        params, opt_state, losses = scan(params, opt_state, key, 10)
        traj = np.asarray(jax.device_get(losses))
        t = _timed(lambda: scan(params, opt_state, key, 10), n=1, warmup=1)
        return traj, t / 10.0

    prior = os.environ.get("QCPINN_BLOCK_PRECISION")
    try:
        traj_hi, dt_hi = run("highest")
        traj_h, dt_h = run("high")
    finally:
        # restore the caller's knob (or unset) rather than clobbering it
        if prior is None:
            os.environ.pop("QCPINN_BLOCK_PRECISION", None)
        else:
            os.environ["QCPINN_BLOCK_PRECISION"] = prior
    row = {
        "check": f"streams train step {n_qubits}q B={batch}",
        "ms_highest": round(dt_hi * 1e3, 2),
        "ms_high": round(dt_h * 1e3, 2),
        "speedup_high": round(dt_hi / dt_h, 3),
        "loss_traj_max_rel_dev": float(
            np.max(np.abs(traj_h - traj_hi) / np.abs(traj_hi))),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    out = {"command": "python scripts/precision_probe.py", "rows": []}
    out["rows"] += forward_rows(16, 256)
    out["rows"] += forward_rows(12, 1024)
    out["rows"].append(train_rows(12, 1024))
    out["rows"].append(train_rows(16, 256))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "block_precision_onchip.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": path}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
