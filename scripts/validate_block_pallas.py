"""On-chip validation of the fused block-evolution Pallas kernel.

Gate for flipping QCPINN_AUTO_FUSED default-on (ops/pallas_loop.py
make_fused_circuit): runs the block_pallas backend COMPILED on the real
TPU against the plain block engine (itself dense-oracle-tested) and
checks

  1. forward ⟨Z⟩ parity at 12q and 16q (atol 1e-5),
  2. loss+grad parity through a streams train step at 12q,
  3. step-time ratio block_pallas / block at the bench config
     (12q, B=1024) and the flagship probe (16q, B=256).

Prints one JSON line per check. Exit 0 iff all parity checks pass.

Run on the TPU chip: python scripts/validate_block_pallas.py
"""

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


def forward_parity(n_qubits, batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qcpinn_tpu.ops import block_pallas as bp
    from qcpinn_tpu.ops.block_fused import BlockFusedCircuit
    from qcpinn_tpu.ops.circuit import DVCircuit

    circ = DVCircuit(num_qubits=n_qubits, num_quantum_layers=1,
                     q_ansatz="cross_mesh")
    assert bp.supports(circ)
    ref = BlockFusedCircuit(circ)
    fused = bp.BlockPallasCircuit(circ, interpret=False)
    key = jax.random.PRNGKey(0)
    params = circ.init_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_qubits),
                          jnp.float32)

    f_ref = jax.jit(lambda p, x: ref(p, x))
    f_new = jax.jit(lambda p, x: fused(p, x))
    a = np.asarray(f_ref(params, x))
    b = np.asarray(f_new(params, x))
    err = float(np.max(np.abs(a - b)))
    t_ref = _timed(f_ref, params, x)
    t_new = _timed(f_new, params, x)
    row = {
        "check": f"forward {n_qubits}q B={batch}",
        "max_abs_err": err,
        "ok": err < 1e-5,
        "ms_block": round(t_ref * 1e3, 3),
        "ms_block_pallas": round(t_new * 1e3, 3),
        "speedup": round(t_ref / t_new, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def grad_parity(n_qubits, batch):
    """loss+grad through the DVFourier streams step, both backends."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    def build(backend):
        cfg = QCPINNConfig(num_qubits=n_qubits, num_quantum_layers=1,
                           q_ansatz="cross_mesh", seed=42)
        model = DVFourierSolver(cfg, mapping_size=4)
        model.use_pallas(backend=backend)
        params = model.init(jax.random.PRNGKey(0))

        def loss(p, xyt):
            _, r = dv_diffusion_residual_streams(model, p, xyt)
            return jnp.mean(r * r)

        return params, jax.jit(jax.value_and_grad(loss))

    xyt = jax.random.uniform(jax.random.PRNGKey(7), (batch, 3),
                             jnp.float32)
    p_ref, f_ref = build("block")
    p_new, f_new = build("block_pallas")
    l_ref, g_ref = f_ref(p_ref, xyt)
    l_new, g_new = f_new(p_new, xyt)
    l_err = float(abs(l_ref - l_new))
    g_err = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new))
    )
    t_ref = _timed(f_ref, p_ref, xyt)
    t_new = _timed(f_new, p_new, xyt)
    row = {
        "check": f"streams loss+grad {n_qubits}q B={batch}",
        "loss_abs_err": l_err,
        "grad_max_abs_err": g_err,
        "ok": l_err < 1e-5 and g_err < 1e-4,
        "ms_block": round(t_ref * 1e3, 3),
        "ms_block_pallas": round(t_new * 1e3, 3),
        "speedup": round(t_ref / t_new, 3),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    rows.append(forward_parity(12, 1024))
    rows.append(forward_parity(16, 256))
    rows.append(grad_parity(12, 256))
    ok = all(r["ok"] for r in rows)
    out = {"command": "python scripts/validate_block_pallas.py",
           "ok": ok, "rows": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "block_pallas_onchip.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": path, "all_ok": ok}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
