"""Multi-chip QCPINN training walkthrough: ('data', 'amp') mesh setup.

Runs the same tangent-streams diffusion train step three ways —
single-device, amp-sharded per-gate engine, amp-sharded GSPMD block
engine — and prints per-step losses side by side (they match to float
tolerance: the sharded engines are exact, not approximations).

The reference is single-process PyTorch/PennyLane (SURVEY.md §2.2: no
distributed backend anywhere); this is the capability that replaces it on
a TPU pod slice. On real hardware the same code runs unchanged: build the
mesh from jax.devices() and the collectives ride ICI instead of host
memory.

No TPU needed to try it:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip.py --devices 8 --qubits 8 --steps 5
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--amp", type=int, default=4,
                    help="statevector ('tensor') parallel degree; the rest "
                         "of --devices becomes the data axis")
    ap.add_argument("--qubits", type=int, default=8)
    ap.add_argument("--ansatz", default="cross_mesh")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--tpu", action="store_true",
                    help="use the real accelerator devices instead of the "
                         "default virtual CPU mesh (needs >= --devices chips)")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    # Platform selection must happen BEFORE the first jax.devices() call:
    # backends initialize lazily and the jax_platforms update is a silent
    # no-op afterwards (and probing a TPU plugin first can hang). Default
    # to the virtual CPU mesh; --tpu opts into real chips.
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import gaussian_pulse_samplers
    from qcpinn_tpu.models import DVSolver
    from qcpinn_tpu.parallel import make_mesh, replicate
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams
    from qcpinn_tpu.train import diffusion_terms, make_train_step
    from qcpinn_tpu.train import optim as topt

    devices = jax.devices()[: args.devices]
    assert args.devices % args.amp == 0, "--amp must divide --devices"
    mesh = make_mesh(data=args.devices // args.amp, amp=args.amp,
                     devices=devices)
    print(f"mesh: {dict(mesh.shape)} on {devices[0].platform}")

    cfg = QCPINNConfig(
        num_qubits=args.qubits, num_quantum_layers=1, q_ansatz=args.ansatz,
        classic_network=(3, 24, 1), batch_size=args.batch_size, epochs=1,
        lr=1e-3, seed=0, scheduler="none",
    )
    terms = diffusion_terms(gaussian_pulse_samplers(), cfg.batch_size)
    optimizer = topt.make_optimizer(cfg.lr, grad_clip=1.0, schedule="none")

    def run(label: str, model, use_mesh: bool):
        params = model.init(jax.random.PRNGKey(0))
        if use_mesh:
            params = replicate(params, mesh)
        rfn = lambda p, X: dv_diffusion_residual_streams(model, p, X)
        _, scan_steps = make_train_step(
            model.apply, None, terms, optimizer, cfg,
            mesh=(mesh if use_mesh else None), residual_fn=rfn,
            fuse_value_terms=True,
        )
        t0 = time.time()
        out = scan_steps(
            params, optimizer.init(jax.device_get(params)),
            topt.plateau_init(), jax.random.PRNGKey(1), 0, args.steps,
        )
        losses = jax.device_get(out[3]["loss"])
        dt = time.time() - t0
        print(f"{label:>22}: losses {[f'{l:.5f}' for l in losses]}  "
              f"({dt:.1f}s incl. compile)")
        return losses

    l_single = run("single-device", DVSolver(cfg), False)
    l_gate = run("amp-sharded (gate)",
                 DVSolver(cfg).use_sharded(mesh, backend="gate"), True)
    l_block = run("amp-sharded (block)",
                  DVSolver(cfg).use_sharded(mesh, backend="block"), True)

    drift = max(
        max(abs(float(a) - float(b)) for a, b in zip(l_gate, l_single)),
        max(abs(float(a) - float(b)) for a, b in zip(l_block, l_single)),
    )
    print(f"max trajectory drift vs single-device: {drift:.2e} "
          f"(exact sharding: both engines reproduce the same training)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
