"""North-star run: 16-qubit cross_mesh QCPINN on convection-diffusion,
targeting <1e-3 relative L2 within a wall-clock budget (BASELINE.json).

Trains against the *consistent* forcing r_true (the residual of the analytic
solution — see data/diffusion.py for the reference's +400*D*u forcing
defect, which makes <1e-3 unreachable by construction if reproduced).

The defaults reproduce the met target (PARITY.md): 16q cross_mesh, RBF
output head, pulse-focused sampling, classical-then-quantum staging,
streams + MXU block engine -> rel-L2 ~1e-4 in <5 min on one v5e chip.

Usage:
  python examples/north_star.py            # the 16q headline run
  python examples/north_star.py --qubits 6 --stage1-minutes 0 --total-steps 30000
"""

from __future__ import annotations

import argparse
import dataclasses
import zlib
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=16)
    ap.add_argument("--ansatz", default="cross_mesh")
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--minutes", type=float, default=4.5)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--total-steps", type=int, default=700,
                    help="cosine horizon; training stops at --minutes. Set "
                    "this near the achievable step count so the lr anneals "
                    "(700 matches the 16q default; thousands at low qubit "
                    "counts)")
    ap.add_argument("--plain", action="store_true", help="use the plain DVSolver")
    ap.add_argument("--solver", default=None,
                    choices=["fourier", "plain", "classical"],
                    help="fourier (default) | plain | classical "
                    "(no-quantum Hopfield ablation)")
    ap.add_argument("--backend", default="auto",
                    help="fused-circuit backend: auto|block|loop|unrolled|xla")
    ap.add_argument("--focus-frac", type=float, default=0.5,
                    help="fraction of residual points drawn around the pulse "
                    "(0 = uniform, the round-1 recipe)")
    ap.add_argument("--focus-sigma", type=float, default=0.12)
    ap.add_argument("--supervised", action="store_true",
                    help="ablation: fit u directly (value loss on domain "
                    "samples) instead of the PDE residual — isolates the "
                    "PINN optimization barrier from plain approximation")
    ap.add_argument("--mapping", type=int, default=32,
                    help="Fourier feature count (DVFourierSolver)")
    ap.add_argument("--ff-scale", type=float, default=4.0)
    ap.add_argument("--skip-dim", type=int, default=32)
    ap.add_argument("--no-quantum", action="store_true",
                    help="ablation: identity quantum block (z = angles) — "
                    "same architecture, no circuit")
    ap.add_argument("--rbf", type=int, default=8,
                    help="additive Gaussian-RBF output head units (0 = off); "
                    "centers drawn where |forcing| is large")
    ap.add_argument("--rbf-width", type=float, default=8.0)
    ap.add_argument("--stage1-minutes", type=float, default=1.5,
                    help="two-phase schedule (the reference's classical-then-"
                    "quantum staging, test_hqpinn_cg.py:180-199): phase 1 "
                    "trains with a zeroed quantum block (no circuit cost), "
                    "phase 2 joint-trains the full QCPINN for the remaining "
                    "budget")
    ap.add_argument("--stage1-steps", type=int, default=40000)
    ap.add_argument("--z-rescale", type=float, default=1e-2,
                    help="scale on the decoder's quantum-feature columns at "
                    "the phase-1 -> phase-2 handoff, so switching on the "
                    "circuit perturbs the converged fit smoothly")
    ap.add_argument("--artifact", default="",
                    help="also write {command, result} JSON to this path")
    ap.add_argument("--lr2", type=float, default=None,
                    help="phase-2 lr (default lr/5)")
    args = ap.parse_args()

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.models import ClassicalSolver, DVSolver
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver
    from qcpinn_tpu.physics.operators_fwd import diffusion_operator_fwd
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams
    from qcpinn_tpu.train import TermSpec, make_train_step
    from qcpinn_tpu.train import optim as topt
    from qcpinn_tpu.utils.evaluation import evaluate_relative_l2

    solver = args.solver or ("plain" if args.plain else "fourier")
    cfg = QCPINNConfig(
        num_qubits=args.qubits,
        num_quantum_layers=args.layers,
        q_ansatz=args.ansatz,
        classic_network=(3, args.hidden, 1),
        batch_size=args.batch,
        lr=args.lr,
        seed=args.seed,
        scheduler="cosine",
        epochs=args.total_steps,
    )
    if solver == "fourier":
        rbf_centers = None
        if args.rbf > 0:
            from qcpinn_tpu.models import nn_core as nc

            Xp = jax.random.uniform(jax.random.PRNGKey(123), (4096, 3))
            rbf_centers = nc.rbf_centers_from_samples(
                jax.random.PRNGKey(124), Xp, dd.r_true(Xp), args.rbf
            )
        model = DVFourierSolver(
            cfg, mapping_size=args.mapping, ff_scale=args.ff_scale,
            skip_dim=args.skip_dim, rbf_count=args.rbf,
            rbf_width=args.rbf_width, rbf_centers=rbf_centers,
        )
    else:
        model = {"plain": DVSolver, "classical": ClassicalSolver}[solver](cfg)
    # tangent-stream residuals: mandatory at high qubit counts (nested AD
    # through a 2^16 state memory-caps the batch — physics/streams.py).
    # Computed BEFORE backend selection: when streams are off and the
    # residual term is active, the residual runs forward-mode
    # (diffusion_operator_fwd) through the quantum block, which the
    # custom_vjp Pallas kernels cannot support — only the block engine can.
    use_streams = (
        solver in ("fourier", "plain") and not args.no_quantum
        and not args.supervised and args.qubits >= 10
    )
    if solver != "classical" and args.no_quantum:
        class _IdentityQ:  # bisection probe: bypass the circuit entirely
            def apply(self, qp, x, **kw):
                return x

        model._fused = _IdentityQ()
    elif solver != "classical" and args.backend != "xla":
        backend = args.backend
        need_fwd_ad = (not args.supervised) and not use_streams
        if need_fwd_ad and backend in ("auto", "loop", "unrolled"):
            if backend != "auto":
                print(
                    f"[north-star] backend {backend!r} is reverse-only; the "
                    "residual path needs forward-mode AD — using 'block'"
                )
            backend = "block"
        model.use_pallas(backend=backend)
    params = model.init(jax.random.PRNGKey(cfg.seed))

    box = dd._box
    third = max(args.batch // 3, 1)
    if args.focus_frac > 0.0:
        res_sampler = dd.pulse_residual_sampler(
            frac=args.focus_frac, sigma=args.focus_sigma, func=dd.r_true
        )
    else:
        res_sampler = dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true, "res")
    if args.supervised:
        sup_sampler = dataclasses.replace(res_sampler, func=dd.u) if isinstance(
            res_sampler, dd.MixtureSampler
        ) else dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.u, "sup")
        res_term = TermSpec(sup_sampler, 1.0, args.batch, "value")
    else:
        res_term = TermSpec(res_sampler, 1.0, args.batch, "residual")
    terms = {
        "res": res_term,
        "ic": TermSpec(dd.Sampler(box([[0, 0, 0], [0, 1, 1]]), dd.u), 10.0, third, "value"),
        "bcx0": TermSpec(dd.Sampler(box([[0, 0, 0], [1, 0, 1]]), dd.u), 10.0, third, "value"),
        "bcx1": TermSpec(dd.Sampler(box([[0, 1, 0], [1, 1, 1]]), dd.u), 10.0, third, "value"),
        "bcy0": TermSpec(dd.Sampler(box([[0, 0, 0], [1, 1, 0]]), dd.u), 10.0, third, "value"),
        "bcy1": TermSpec(dd.Sampler(box([[0, 0, 1], [1, 1, 1]]), dd.u), 10.0, third, "value"),
    }
    def run_phase(apply_fn, params, lr, total_steps, budget_s, chunk, label,
                  residual_fn=None):
        # distinct sample stream per phase (stage 2 must not replay the
        # exact collocation batches stage 1 already consumed)
        key = jax.random.fold_in(jax.random.PRNGKey(1), zlib.crc32(label.encode()))
        """Adam phase: compile outside the budget, then chunked scan until
        the wall-clock budget or the cosine horizon is reached."""
        optimizer = topt.make_optimizer(
            lr, grad_clip=1.0, schedule="cosine", epochs=total_steps
        )
        opt_state = optimizer.init(params)
        sched = topt.plateau_init()
        _, scan_steps = make_train_step(
            apply_fn, diffusion_operator_fwd, terms, optimizer, cfg,
            residual_fn=residual_fn, fuse_value_terms=True,
        )
        out = scan_steps(params, opt_state, sched, key, 0, chunk)
        float(jax.device_get(out[3]["loss"])[-1])
        params, opt_state, sched = out[0], out[1], out[2]
        done = chunk
        t0 = time.time()
        losses = []
        while time.time() - t0 < budget_s and done < total_steps:
            out = scan_steps(params, opt_state, sched, key, done, chunk)
            loss = float(jax.device_get(out[3]["loss"])[-1])
            params, opt_state, sched = out[0], out[1], out[2]
            done += chunk
            losses.append(loss)
            if len(losses) % 5 == 0:
                el = time.time() - t0
                print(f"[{label}] step {done}: loss={loss:.3e} elapsed={el:.0f}s",
                      flush=True)
        return params, done, time.time() - t0, losses

    budget = args.minutes * 60.0
    residual_fn = (
        (lambda p, X: dv_diffusion_residual_streams(model, p, X))
        if use_streams else None
    )
    stage_info = None
    if args.stage1_minutes > 0 and solver == "fourier" and not args.no_quantum:
        # phase 1: zeroed quantum block — decoder sees z=0, so the circuit
        # is never evaluated and the z-columns of the first post layer get
        # zero gradient (they keep their init until phase 2)
        class _ZeroQ:
            def apply(self, qp, x, **kw):
                return jnp.zeros((x.shape[0], cfg.num_qubits), x.dtype)

        model1 = DVFourierSolver(
            cfg, mapping_size=args.mapping, ff_scale=args.ff_scale,
            skip_dim=args.skip_dim, rbf_count=args.rbf,
            rbf_width=args.rbf_width, rbf_centers=rbf_centers,
        )
        model1._fused = _ZeroQ()
        s1_budget = min(args.stage1_minutes * 60.0, budget)
        params, d1, t1, l1 = run_phase(
            model1.apply, params, args.lr, args.stage1_steps, s1_budget,
            max(args.chunk, 500), "stage1",
        )
        # handoff: damp the decoder's quantum-feature columns so switching
        # the circuit on perturbs the converged fit smoothly
        w0 = params["post"][0]["w"]
        params["post"][0]["w"] = w0.at[: cfg.num_qubits, :].multiply(args.z_rescale)
        lr2 = args.lr2 if args.lr2 is not None else args.lr / 5.0
        params, d2, t2, l2 = run_phase(
            model.apply, params, lr2, args.total_steps, budget - t1,
            args.chunk, "stage2", residual_fn=residual_fn,
        )
        done, train_time, losses = d1 + d2, t1 + t2, l1 + l2
        stage_info = {"stage1_steps": d1, "stage1_seconds": round(t1, 1),
                      "stage2_steps": d2, "stage2_seconds": round(t2, 1)}
    else:
        params, done, train_time, losses = run_phase(
            model.apply, params, args.lr, args.total_steps, budget,
            args.chunk, "train", residual_fn=residual_fn,
        )

    # at high qubit counts the residual eval must also ride streams —
    # nested AD through the 2^16 state would blow HBM at eval batch sizes
    eval_operator = (
        (lambda _apply, X: dv_diffusion_residual_streams(model, params, X))
        if use_streams else diffusion_operator_fwd
    )
    metrics = evaluate_relative_l2(
        model.apply, params, dd.u, analytic_r=dd.r_true,
        operator=eval_operator, num=20,
        batch=min(4096 if args.qubits < 10 else 512, 8 * args.batch),
    )
    result = {
        "qubits": args.qubits,
        "ansatz": args.ansatz,
        "solver": solver,
        "focus_frac": args.focus_frac,
        "steps": done,
        "train_seconds": round(train_time, 1),
        "final_loss": losses[-1] if losses else None,
        "rel_l2_u": metrics["rel_l2_u_percent"] / 100.0,
        "rel_l2_r": metrics.get("rel_l2_r_percent", None),
        "points_per_sec": round(done * args.batch / train_time, 1),
    }
    if stage_info:
        # the headline throughput must describe the QUANTUM train step, not
        # the near-free zeroed-circuit stage-1 steps
        result["points_per_sec"] = round(
            stage_info["stage2_steps"] * args.batch
            / max(stage_info["stage2_seconds"], 1e-9), 1,
        )
        result.update(stage_info)
    print(json.dumps(result))
    if args.artifact:
        # machine-readable run record with its exact command line, the
        # artifact standard the cz runs set (VERDICT r3 weak #4)
        with open(args.artifact, "w") as f:
            json.dump(
                {"command": "python " + " ".join(sys.argv), "result": result},
                f, indent=1,
            )


if __name__ == "__main__":
    main()
