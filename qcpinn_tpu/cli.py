"""Command-line entry points.

`python -m qcpinn_tpu.cli train` is the consolidation of the reference's
argparse CLI (train_hybrid_qpinn.py:50-109) and config-script trainers
(trainer/diffusion_hybrid_trainer*.py): pick a solver (DV/CV/Classical), an
ansatz, a problem, train, evaluate relative-L2 on the meshgrid, and emit
plots + checkpoints into a timestamped run directory.

`python -m qcpinn_tpu.cli cz` runs the two-phase Czochralski pipeline
(CG_HQPINN_IBMtest_16qubits.py CLI): --phase pretrain|finetune with a
checkpoint handoff, plus --quick-check smoke mode (:663-680).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="qcpinn_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a PDE solver")
    t.add_argument("--problem", default="diffusion",
                   choices=["diffusion", "diffusion_sine", "wave", "klein_gordon",
                            "helmholtz", "navier_stokes"])
    t.add_argument("--solver", default="DV", choices=["DV", "CV", "Classical"])
    t.add_argument("--ansatz", default="cascade",
                   choices=["cascade", "layered", "alternate", "farhi",
                            "sim_circ_15", "cross_mesh", "rot_ring"])
    t.add_argument("--encoding", default="angle",
                   choices=["angle", "angle_pi", "amplitude"],
                   help="angle = RX(x_i) AngleEmbedding; angle_pi = "
                        "RX(pi*x_i) (the standalone trainer's embedding, "
                        "trainer/train.py:205-207 — pair with --ansatz "
                        "rot_ring); amplitude = normalized zero-padded")
    t.add_argument("--num-qubits", type=int, default=4)
    t.add_argument("--num-layers", type=int, default=1)
    t.add_argument("--cutoff-dim", type=int, default=6)
    t.add_argument("--cv-class", type=int, default=1, choices=[1, 2, 3])
    t.add_argument("--cv-readout", default=None, choices=["n", "x"],
                   help="override the variant's readout operator "
                        "(default: the reference's — 'x' for class 2, "
                        "'n' otherwise; the round-5 diagnosis pinned the "
                        "class-1/3 stall to the <n>-at-vacuum readout)")
    t.add_argument("--hidden-dim", type=int, default=50)
    t.add_argument("--epochs", type=int, default=20000)
    t.add_argument("--batch-size", type=int, default=64)
    t.add_argument("--lr", type=float, default=5e-3)
    t.add_argument("--seed", type=int, default=42)
    t.add_argument("--print-every", type=int, default=500)
    t.add_argument("--scheduler", default="plateau", choices=["plateau", "cosine", "none"])
    t.add_argument("--best-val", action="store_true",
                   help="track a fixed 512-point analytic-solution "
                        "validation set every logging chunk and keep the "
                        "best params seen (train/loop.py best-val, the "
                        "reference's si_q_pinn_improved.py:608-624 "
                        "capability) — rescues oscillating runs (measured: "
                        "the CV solver's loss visits ~1e-2 then diverges "
                        "at the reference's own lr; see PARITY.md)")
    t.add_argument("--shots", type=int, default=None,
                   help="shot-noise simulation mode (hardware fidelity); "
                        "takes effect with --gradient-mode parameter-shift "
                        "or spsa (backprop trains analytic, as the "
                        "reference's AER mode)")
    t.add_argument("--gradient-mode", default="backprop",
                   choices=["backprop", "parameter-shift", "spsa",
                            "spsa-split"],
                   help="quantum gradient path (readme.md:166-171): "
                        "backprop = analytic simulator; parameter-shift = "
                        "shot-sampled shifted evaluations on value terms; "
                        "spsa = 2-eval zeroth-order updates on the FULL "
                        "pytree; spsa-split = SPSA on the quantum weights "
                        "+ Adam on the classical partition (the "
                        "reference's hardware recipe, "
                        "cg-hqpinn/...:727-748)")
    t.add_argument("--loss-balancer", default="none",
                   choices=["none", "ema", "uncertainty"],
                   help="adaptive loss balancing: ema = EMAWeights "
                        "ratio-to-average normalization (CG_HQPINN_"
                        "IBMtest_16qubits.py:408-423); uncertainty = "
                        "trainable homoscedastic log-variances replacing "
                        "the static weights (si_q_pinn_improved.py:"
                        "143-164). Requires --gradient-mode backprop")
    t.add_argument("--noise-depolarizing", type=float, default=0.0)
    t.add_argument("--noise-readout", type=float, default=0.0)
    t.add_argument("--noise-per-gate", type=float, default=0.0,
                   help="depth-aware depolarizing rate applied per gate "
                        "per touched wire: <Z_w> damps by (1-p)^(gate "
                        "count on w), so error accumulates with circuit "
                        "depth like the reference's FakeSherbrooke device "
                        "noise (cg-hqpinn/...:183-196)")
    t.add_argument("--output-dir", default="runs")
    t.add_argument("--run-name", default=None)
    t.add_argument("--eval-grid", type=int, default=20)
    t.add_argument("--metrics-json", default="",
                   help="also write {command, config, metrics, final_loss} "
                        "to this JSON path (the artifact standard of the "
                        "cz runs)")
    t.add_argument("--no-plots", action="store_true")
    t.add_argument("--data-parallel", action="store_true",
                   help="shard the collocation batch over all local devices")

    g = sub.add_parser(
        "crystal",
        help="phase-field crystal growth: 5-output hybrid model trained "
             "by SPSA (hybrid_qpinn_2dcrystal_ibmtest.py)")
    g.add_argument("--n-qubits", type=int, default=4)
    g.add_argument("--n-layers", type=int, default=3)
    g.add_argument("--spsa-steps", type=int, default=50)
    g.add_argument("--spsa-lr", type=float, default=0.02)
    g.add_argument("--spsa-delta", type=float, default=0.01)
    g.add_argument("--n-bulk", type=int, default=32)
    g.add_argument("--n-interface", type=int, default=64)
    g.add_argument("--warmup-epochs", type=int, default=0,
                   help="classical-only Adam pretrain epochs before SPSA "
                        "(the staged recipe of test_hqpinn_cg.py:180-199)")
    g.add_argument("--warmup-lr", type=float, default=1e-3)
    g.add_argument("--mode", default="spsa", choices=["spsa", "spsa-split"],
                   help="spsa = quantum weights only (reference fidelity); "
                        "spsa-split = + simultaneous Adam on the classical "
                        "partition (cg-hqpinn recipe)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--log-every", type=int, default=5)
    g.add_argument("--artifact", default="",
                   help="write a machine-readable run record (config + "
                        "loss histories) to this JSON path")
    g.add_argument("--save", default="", help="checkpoint path")
    g.add_argument("--output-dir", default="runs")

    c = sub.add_parser("cz", help="Czochralski two-phase pipeline")
    c.add_argument("--phase", choices=["pretrain", "finetune", "eval"],
                   required=True)
    c.add_argument("--data", required=True)
    c.add_argument("--save", default="",
                   help="checkpoint path (required for pretrain/finetune)")
    c.add_argument("--load", default="")
    c.add_argument("--n-qubits", type=int, default=16)
    c.add_argument("--n-layers", type=int, default=2)
    c.add_argument("--epochs", type=int, default=2000)
    c.add_argument("--batch-size", type=int, default=16)
    c.add_argument("--lr", type=float, default=1e-3)
    # defaults track the reference flagship CLI (CG...16qubits.py:627-648)
    c.add_argument("--re", type=float, default=15.0)
    c.add_argument("--pr", type=float, default=28.463)
    c.add_argument("--gr", type=float, default=8000.0)
    c.add_argument("--physics-weight", type=float, default=0.05)
    c.add_argument("--physics-warmup", type=int, default=150)
    c.add_argument("--physics-ramp", type=int, default=400)
    c.add_argument("--log-every", type=int, default=10)
    c.add_argument("--physics-normalize", default="reference",
                   choices=["reference", "balanced", "coupled"],
                   help="'reference' = the EMAWeights ratio-to-average "
                        "scheme (collapses the data fit when raw residuals "
                        "dwarf the data loss); 'balanced' = scale physics "
                        "to the data-loss magnitude via absolute EMAs; "
                        "'coupled' = trainable CoupledAdaptiveWeighting "
                        "(modified_qpinn_cg.py:142-156, see "
                        "--coupled-ratio)")
    c.add_argument("--coupled-ratio", type=float, default=100.0,
                   help="data:physics noise-scale ratio for "
                        "--physics-normalize coupled")
    c.add_argument("--field-weights", default=None,
                   help="comma-separated data-loss weights over "
                        "u_r,u_z,u_theta,p,T (normalized to mean 1); "
                        "upweights the small-magnitude velocity fields "
                        "that uniform MSE under-fits")
    c.add_argument("--time-budget", type=float, default=0.0,
                   help="pretrain wall-clock budget in minutes (0 = none): "
                        "stop gracefully after the epoch that crosses it "
                        "and save the final checkpoint — unlike an external "
                        "`timeout`, no training is lost to the kill")
    c.add_argument("--shots", type=int, default=4096)
    c.add_argument("--calib-size", type=int, default=8)
    c.add_argument("--train-scope", default="head", choices=["head", "full"])
    c.add_argument("--noise-depolarizing", type=float, default=0.0,
                   help="noisy-simulator finetune (the reference's ibm-sim "
                        "phase with a FakeSherbrooke stand-in)")
    c.add_argument("--noise-readout", type=float, default=0.0)
    c.add_argument("--noise-per-gate", type=float, default=0.0,
                   help="depth-aware per-gate depolarizing for the "
                        "finetune phase (see train --noise-per-gate)")
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--save-every", type=int, default=0)
    c.add_argument("--data-parallel", action="store_true",
                   help="pretrain/eval data-parallel over all local devices "
                        "(the node batch shards over the mesh 'data' axis; "
                        "XLA inserts the gradient reduction)")
    c.add_argument("--trunk-width", type=int, default=128,
                   help="classical trunk width (reference: 128). The "
                        "velocity rel-L2 floor at the reference budget is "
                        "capacity-limited (PARITY.md probe: ~10x params "
                        "halves it); use the same width for --load/eval")
    c.add_argument("--amp", type=int, default=1,
                   help="amplitude-shard the circuit's 2^n statevector over "
                        "this many devices (GSPMD; remaining devices form "
                        "the 'data' axis) — the multi-chip road past the "
                        "per-chip HBM ladder (PARITY.md)")
    c.add_argument("--quick-check", action="store_true",
                   help="2-epoch, tiny-model smoke run")
    c.add_argument("--output-dir", default="runs")
    c.add_argument("--no-plots", action="store_true")
    return p


def cmd_train(args) -> int:
    import jax
    import numpy as np

    from .config import QCPINNConfig
    from .data import diffusion as dd
    from .models import ClassicalSolver, DVSolver
    from .models.cv_solver import CVSolver
    from .models.nn_core import count_trainable
    from .physics import get_operator
    from .train import TermSpec, train
    from .utils.logger import Logging
    from .utils.evaluation import evaluate_relative_l2

    in_dims = {"diffusion": 3, "diffusion_sine": 3, "wave": 2,
               "klein_gordon": 2, "helmholtz": 2, "navier_stokes": 3}
    out_dims = {"navier_stokes": 3}  # [u, v, p]
    cfg = QCPINNConfig(
        problem=args.problem,
        solver=args.solver,
        classic_network=(in_dims[args.problem], args.hidden_dim,
                         out_dims.get(args.problem, 1)),
        num_qubits=args.num_qubits,
        num_quantum_layers=args.num_layers,
        q_ansatz=args.ansatz,
        encoding=args.encoding,
        cv_class=args.cv_class,
        cutoff_dim=args.cutoff_dim,
        cv_readout=args.cv_readout,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        seed=args.seed,
        print_every=args.print_every,
        scheduler=args.scheduler,
        shots=args.shots,
        gradient_mode=args.gradient_mode,
        loss_balancer=args.loss_balancer,
        noise_depolarizing=args.noise_depolarizing,
        noise_readout=args.noise_readout,
        noise_per_gate=args.noise_per_gate,
        output_dir=args.output_dir,
        run_name=args.run_name,
    )
    logger = Logging(cfg.output_dir, cfg.run_name or f"{cfg.solver}-{cfg.q_ansatz}-{cfg.problem}")
    logger.dump_config(cfg)

    model = {"DV": DVSolver, "CV": CVSolver, "Classical": ClassicalSolver}[cfg.solver](cfg)
    # forward-mode residuals for point-decoupled models; the Hopfield
    # baseline couples the batch and needs torch-equivalent reverse mode
    op_mode = "rev" if cfg.solver == "Classical" else "fwd"

    if cfg.solver == "DV":
        # circuit diagram into the run dir (nn/DVPDESolver.py:144-158)
        from .utils.drawing import draw_circuit

        draw_circuit(model.circuit, logger.get_output_dir())
        logger.print("circuit diagram written (circuit.txt / circuit.pdf)")
    elif cfg.solver == "CV":
        # CV program diagram (nn/CVPDESolver.py:139-152 draw_quantum_circuit)
        from .utils.drawing import draw_cv_circuit

        draw_cv_circuit(model.cv, logger.get_output_dir())
        logger.print("CV circuit diagram written (circuit.txt / circuit.pdf)")

    # problem setup: samplers + operator + analytic oracle
    box = dd._box
    if args.problem == "diffusion":
        samplers = dd.gaussian_pulse_samplers()
        from .train import diffusion_terms

        terms = diffusion_terms(samplers, cfg.batch_size, cfg.loss_weights)
        operator = get_operator("diffusion", op_mode)
        analytic_u, analytic_r = dd.u, dd.r_true
    elif args.problem == "diffusion_sine":
        s = dd.sine_samplers()
        third = max(cfg.batch_size // 3, 1)
        twelfth = max(cfg.batch_size // 12, 1)
        terms = {
            "res": TermSpec(s["res"], 2.0, cfg.batch_size, "residual"),
            "ic": TermSpec(s["ics"], 2.0, third, "value"),
            **{
                f"bc{i}": TermSpec(s[f"bc{i}"], 4.0, twelfth, "value")
                for i in range(1, 5)
            },
        }
        base_op = get_operator("diffusion", op_mode)
        operator = lambda apply, X: base_op(apply, X, v_x=0.0, v_y=0.0)
        analytic_u, analytic_r = dd.u_sine, None
    elif args.problem == "wave":
        # u = sin(x - 2t): IC at t=0, zero residual in the domain
        import jax.numpy as jnp

        def jnp_sin_wave(X):
            return jnp.sin(X[:, 1:2] - 2.0 * X[:, 0:1])

        terms = {
            "res": TermSpec(dd.Sampler(box([[0, 0], [1, 1]]), dd.zero_target), 2.0, cfg.batch_size, "residual"),
            "ic": TermSpec(dd.Sampler(box([[0, 0], [0, 1]]), jnp_sin_wave), 2.0, max(cfg.batch_size // 3, 1), "value"),
            "bc": TermSpec(dd.Sampler(box([[0, 0], [1, 0]]), jnp_sin_wave), 4.0, max(cfg.batch_size // 3, 1), "value"),
        }
        operator = get_operator("wave", op_mode)
        analytic_u, analytic_r = jnp_sin_wave, None
    elif args.problem == "klein_gordon":
        import jax.numpy as jnp

        def kg_u(X):
            return jnp.sin(jnp.pi * X[:, 1:2]) * jnp.cos(jnp.pi * X[:, 0:1])

        terms = {
            "res": TermSpec(dd.Sampler(box([[0, 0], [1, 1]]), dd.zero_target), 2.0, cfg.batch_size, "residual"),
            "ic": TermSpec(dd.Sampler(box([[0, 0], [0, 1]]), kg_u), 2.0, max(cfg.batch_size // 3, 1), "value"),
            "bc": TermSpec(dd.Sampler(box([[0, 0], [1, 0]]), kg_u), 4.0, max(cfg.batch_size // 3, 1), "value"),
        }
        operator = get_operator("klein_gordon", op_mode)
        analytic_u, analytic_r = kg_u, None
    elif args.problem == "helmholtz":
        import jax.numpy as jnp

        def hh_u(X):
            return jnp.sin(jnp.pi * X[:, 0:1]) * jnp.sin(jnp.pi * X[:, 1:2])

        def hh_forcing(X):
            return (1.0 - 2.0 * jnp.pi**2) * hh_u(X)

        terms = {
            "res": TermSpec(dd.Sampler(box([[0, 0], [1, 1]]), hh_forcing), 2.0, cfg.batch_size, "residual"),
            "bc1": TermSpec(dd.Sampler(box([[0, 0], [1, 0]]), hh_u), 4.0, max(cfg.batch_size // 3, 1), "value"),
            "bc2": TermSpec(dd.Sampler(box([[0, 0], [0, 1]]), hh_u), 4.0, max(cfg.batch_size // 3, 1), "value"),
        }
        operator = get_operator("helmholtz", op_mode)
        analytic_u, analytic_r = hh_u, None
    elif args.problem == "navier_stokes":
        # Taylor-Green vortex oracle (BASELINE.json config #5: CV photonic
        # solver on NS 2D) — see data/navier_stokes.py
        from .data import navier_stokes as ns

        s = ns.taylor_green_samplers()
        third = max(cfg.batch_size // 3, 1)
        twelfth = max(cfg.batch_size // 12, 1)
        terms = {
            "res": TermSpec(s["res"], 2.0, cfg.batch_size, "residual"),
            "ic": TermSpec(s["ics"], 2.0, third, "value"),
            **{
                f"bc{i}": TermSpec(s[f"bc{i}"], 4.0, twelfth, "value")
                for i in range(1, 5)
            },
        }
        operator = ns.residual_stack(get_operator("navier_stokes", op_mode))
        analytic_u, analytic_r = ns.uvp, None
    else:
        raise ValueError(args.problem)

    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh()
        logger.print(f"data-parallel over mesh {dict(mesh.shape)}")

    val_fn = None
    if args.best_val:
        import jax as _jax
        import jax.numpy as _jnp

        from .train.loop import make_val_fn

        # fixed analytic-solution validation set: half from the residual
        # term's interior box, half split over the value-term (BC/IC wall)
        # samplers — so 'best' params can't favor interior fit while the
        # walls drift (the reference validates on its full data MSE,
        # si_q_pinn_improved.py:599-624)
        k_val = _jax.random.PRNGKey(10_000 + cfg.seed)
        parts = [terms["res"].sampler.sample(k_val, 256)[0]]
        value_terms = [t for t in terms.values() if t.kind == "value"]
        per = max(256 // max(len(value_terms), 1), 1)
        for i, t in enumerate(value_terms):
            parts.append(
                t.sampler.sample(_jax.random.fold_in(k_val, i + 1), per)[0]
            )
        X_val = _jnp.concatenate(parts, axis=0)
        val_fn = make_val_fn(model.apply, X_val, analytic_u(X_val))
        logger.print(
            f"best-val tracking on ({X_val.shape[0]}-point analytic set: "
            f"256 interior + {len(value_terms)} wall/IC samplers)"
        )

    params, history = train(
        model, cfg, terms, operator, logger=logger, mesh=mesh, val_fn=val_fn
    )
    logger.print(f"trainable parameters: {count_trainable(params)}")

    # evaluation + artifacts
    from .utils.checkpoint import save_checkpoint

    ckpt = save_checkpoint(
        os.path.join(logger.get_output_dir(), "model"),
        params,
        loss_history=history,
        config=cfg.to_dict(),
        epoch=cfg.epochs,
    )
    logger.print(f"checkpoint: {ckpt}")

    metrics = {}
    if analytic_u is not None:
        import numpy as _np

        hi = _np.array([1.0, _np.pi, _np.pi]) if args.problem == "navier_stokes" else None
        metrics = evaluate_relative_l2(
            model.apply, params, analytic_u,
            analytic_r=analytic_r,
            operator=operator if analytic_r is not None else None,
            num=args.eval_grid,
            hi=hi,
            dims=in_dims[args.problem],
        )
        for k, v in metrics.items():
            logger.print(f"{k}: {v:.4f}")
    if args.metrics_json:
        import json as _json
        import sys as _sys

        # prefer the argv actually parsed (main(argv=...) callers — tests,
        # wrappers — have an empty/foreign sys.argv)
        arg_list = args._argv if args._argv is not None else _sys.argv[1:]
        with open(args.metrics_json, "w") as f:
            _json.dump(
                {
                    "command": "python -m qcpinn_tpu.cli "
                    + " ".join(arg_list),
                    "config": cfg.masked_dict(),
                    "metrics": {k: float(v) for k, v in metrics.items()},
                    "final_loss": float(history[-1]) if history else None,
                    "trainable_params": count_trainable(params),
                },
                f, indent=1,
            )
        logger.print(f"metrics artifact written to {args.metrics_json}")
        if not args.no_plots:
            from .utils.plotting import draw_contourf_grid, plot_loss_history

            plot_loss_history(history, logger.get_output_dir())
            # the contour grid is the scalar-u (t, x, y) layout
            if args.problem in ("diffusion", "diffusion_sine"):
                draw_contourf_grid(model.apply, params, analytic_u,
                                   logger.get_output_dir(), per_timestep=True)
            logger.print("plots written")
    return 0


def cmd_crystal(args) -> int:
    """Assembled phase-field crystal-growth pipeline: CrystalPINN +
    crystal_growth_loss + adaptive interface sampling + SPSA — the
    reference's hybrid_qpinn_2dcrystal_ibmtest.py main() (:300-335) as a
    subcommand (no cloud session; the exact engine stands in for the
    Runtime Estimator)."""
    import json

    import jax

    from .models.crystal import CrystalPINN
    from .models.nn_core import count_params
    from .train.crystal import CrystalConfig, train_crystal
    from .utils.logger import Logging

    logger = Logging(args.output_dir, "crystal")
    cfg = CrystalConfig(
        n_qubits=args.n_qubits,
        n_layers=args.n_layers,
        spsa_steps=args.spsa_steps,
        spsa_lr=args.spsa_lr,
        spsa_delta=args.spsa_delta,
        n_bulk=args.n_bulk,
        n_interface=args.n_interface,
        warmup_epochs=args.warmup_epochs,
        warmup_lr=args.warmup_lr,
        mode=args.mode,
        seed=args.seed,
        log_every=args.log_every,
    )
    logger.print(f"crystal config: {json.dumps(dataclasses_asdict(cfg))}")
    model = CrystalPINN(n_qubits=cfg.n_qubits, n_layers=cfg.n_layers)
    params, hist = train_crystal(model, cfg, logger=logger)
    logger.print(f"parameters: {count_params(params)} "
                 f"(quantum: {int(params['q'].size)})")
    h = hist["spsa_history"]
    summary = {
        "config": dataclasses_asdict(cfg),
        "params_total": count_params(params),
        "params_quantum": int(params["q"].size),
        "warmup_history": hist["warmup_history"],
        "spsa_history": h,
        "spsa_first5_mean": sum(h[:5]) / max(len(h[:5]), 1),
        "spsa_last5_mean": sum(h[-5:]) / max(len(h[-5:]), 1),
    }
    logger.print(
        f"crystal loss: {summary['spsa_first5_mean']:.4e} -> "
        f"{summary['spsa_last5_mean']:.4e} over {len(h)} SPSA steps"
    )
    if args.save:
        from .utils.checkpoint import save_checkpoint

        save_checkpoint(args.save, params, loss_history=h,
                        config=dataclasses_asdict(cfg), epoch=len(h))
        logger.print(f"checkpoint saved to {args.save}.npz")
    if args.artifact:
        import numpy as np  # noqa: F401 (json floats come from device_get)

        with open(args.artifact, "w") as f:
            json.dump(summary, f, indent=1)
        logger.print(f"artifact written to {args.artifact}")
    return 0


def dataclasses_asdict(cfg):
    import dataclasses as _dc

    return _dc.asdict(cfg)


def cmd_cz(args) -> int:
    import jax

    from .data.cz_loader import DataStats, load_cz_data
    from .models.czochralski import Hybrid16QPINN
    from .models.nn_core import count_trainable
    from .train.cz_pipeline import CzConfig, run_finetune, run_pretrain
    from .utils.checkpoint import load_checkpoint, save_checkpoint
    from .utils.logger import Logging

    logger = Logging(args.output_dir, f"cz-{args.phase}")

    if args.quick_check:
        args.epochs = 2
        args.n_qubits = min(args.n_qubits, 4)
        args.n_layers = 1
        args.batch_size = 4
        logger.print("quick-check mode: 2 epochs, tiny circuit")

    # The checkpoint's stats/config are the load-bearing handoff artifact
    # (CG_HQPINN_IBMtest_16qubits.py:560-562): for eval/finetune, restore
    # them BEFORE loading data so the nondimensionalization matches the
    # space the model was trained in, and fail loudly on an architecture
    # mismatch instead of a shape error deep inside the forward pass.
    ckpt_stats = None
    manifest = {}
    if args.load:
        import json as _json
        import os as _os

        manifest_path = args.load + ".json"
        if _os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = _json.load(f)
        if args.phase in ("eval", "finetune"):
            sidecar = args.load + ".stats.json"
            if _os.path.exists(sidecar):
                with open(sidecar) as f:
                    ckpt_stats = DataStats.from_dict(_json.load(f))
            elif manifest.get("stats"):
                # sidecar lost, but the manifest carries the same stats:
                # restore from it so metrics stay in the trained normalized
                # space instead of silently re-deriving from --data
                ckpt_stats = DataStats.from_dict(manifest["stats"])
        ckpt_config = manifest.get("config") or {}
        # architecture guard: a mismatch in any of these passes the
        # leaf-count template check (leaf count is shape-independent) and
        # would die in a shape error deep inside the forward pass
        for field, got in (("trunk_width", args.trunk_width),
                           ("n_qubits", args.n_qubits),
                           ("n_layers", args.n_layers)):
            saved = ckpt_config.get(field)
            if saved is not None and int(saved) != int(got):
                flag = "--" + field.replace("_", "-")
                raise SystemExit(
                    f"checkpoint {args.load} was trained with {flag} "
                    f"{saved}; rerun with {flag} {saved} (got {got})"
                )

    X, Y, stats = load_cz_data(args.data, stats=ckpt_stats)
    if ckpt_stats is not None:
        logger.print("data normalized with the checkpoint's stats sidecar")
    logger.print(f"loaded {X.shape[0]} nodes; stats: {stats.to_json()}")

    cfg = CzConfig(
        n_qubits=args.n_qubits,
        n_layers=args.n_layers,
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        seed=args.seed,
        re=args.re,
        pr=args.pr,
        gr=args.gr,
        physics_weight=args.physics_weight,
        physics_warmup=args.physics_warmup,
        physics_ramp=args.physics_ramp,
        physics_normalize=args.physics_normalize,
        coupled_ratio=args.coupled_ratio,
        log_every=args.log_every,
        finetune_epochs=args.epochs if args.phase == "finetune" else 100,
        shots=args.shots,
        calib_size=args.calib_size,
        train_scope=args.train_scope,
        noise_depolarizing=getattr(args, "noise_depolarizing", 0.0),
        noise_readout=getattr(args, "noise_readout", 0.0),
        noise_per_gate=getattr(args, "noise_per_gate", 0.0),
        field_weights=(
            tuple(float(v) for v in args.field_weights.split(","))
            if args.field_weights else None
        ),
    )
    model = Hybrid16QPINN(
        n_qubits=cfg.n_qubits, n_layers=cfg.n_layers,
        remat=cfg.effective_remat, width=args.trunk_width,
    )

    def ckpt_template():
        # cz bundles store params only — a resume gets a fresh optimizer,
        # matching the reference (CG_HQPINN_IBMtest_16qubits.py:443-455)
        return {"params": model.init(jax.random.PRNGKey(0)),
                "opt_state": None, "sched": None}

    if args.phase in ("pretrain", "finetune") and not args.save:
        raise SystemExit(f"{args.phase} phase requires --save")

    if args.time_budget and args.phase != "pretrain":
        logger.print(
            f"WARNING: --time-budget only applies to the pretrain phase; "
            f"ignored for --phase {args.phase}"
        )

    if getattr(args, "data_parallel", False) and args.phase == "finetune":
        logger.print(
            "WARNING: --data-parallel does not apply to the finetune phase "
            "(its calibration subset is tiny by design); ignored"
        )

    mesh = None
    if args.amp > 1 or getattr(args, "data_parallel", False):
        from .parallel import make_mesh

        n_dev = len(jax.devices())
        if n_dev % args.amp:
            raise SystemExit(f"--amp {args.amp} does not divide the "
                             f"{n_dev} available devices")
        mesh = make_mesh(data=n_dev // args.amp, amp=args.amp)
        logger.print(f"mesh {dict(mesh.shape)}")
        if args.amp > 1:
            # GSPMD statevector sharding (models/czochralski.py
            # use_sharded): the [B, 2^n] state rides P(data, amp)
            model.use_sharded(mesh)

    if args.phase == "eval":
        # field-wise rel-L2 + val MSE over the full node set — the flagship
        # accuracy report (PARITY.md Cz table)
        from .utils.evaluation import evaluate_cz_fields

        if not args.load:
            raise SystemExit("eval phase requires --load with a checkpoint")
        restored = load_checkpoint(args.load, ckpt_template())
        params = restored["bundle"]["params"]
        metrics, pred = evaluate_cz_fields(model.apply, params, X, Y,
                                           return_pred=True, mesh=mesh)
        for k, v in metrics.items():
            logger.print(f"{k}: {v:.6e}")
        if not args.no_plots:
            # truth-vs-prediction field maps over the node cloud — the
            # visual counterpart of the rel-L2 table (the reference plots
            # these in its diagnostics suite, cg-hqpinn/...:515-587)
            from .utils.plotting import plot_field_scatter

            p = plot_field_scatter(
                X, Y, ["u_r", "u_z", "u_theta", "p", "T"],
                logger.get_output_dir(), name="eval_fields", pred=pred,
            )
            logger.print(f"field maps written to {p}")
        import json as _json

        logger.print(_json.dumps(metrics))
        return 0

    if args.phase == "pretrain":
        def ckpt_fn(params, epoch, history):
            save_checkpoint(args.save, params, loss_history=history,
                            stats=stats.to_dict(), config=vars(args), epoch=epoch)

        warm = None
        if args.load:
            # warm start: resume pretraining from a saved checkpoint's
            # params (fresh optimizer/schedule — opt state is not part of
            # the cz checkpoint format, matching the reference's
            # save_checkpoint at CG_HQPINN_IBMtest_16qubits.py:443-455)
            restored_warm = load_checkpoint(args.load, ckpt_template())
            warm = restored_warm["bundle"]["params"]
            logger.print(f"warm start from {args.load}")
            saved_stats = restored_warm.get("stats")
            if saved_stats and saved_stats != stats.to_dict():
                # the warm-started params were trained in the checkpoint's
                # normalized space; training against a different --data
                # export reinterprets them — same hazard the eval/finetune
                # sidecar restore prevents
                logger.print(
                    "WARNING: warm-start checkpoint stats differ from the "
                    "file-derived stats of --data; the warm-started params "
                    "will be reinterpreted in the new normalized space"
                )

        if (mesh is not None and args.quick_check
                and cfg.batch_size % mesh.shape["data"]):
            # smoke mode must stay runnable on any device count: bump
            # the tiny forced batch to one row per data-axis device
            cfg.batch_size = mesh.shape["data"]
            logger.print(
                f"quick-check batch bumped to {cfg.batch_size} "
                f"(one row per device)"
            )

        params, history = run_pretrain(
            model, X, Y, stats, cfg, logger=logger, params=warm,
            checkpoint_fn=ckpt_fn if args.save_every else None,
            save_every=args.save_every,
            time_budget_s=args.time_budget * 60.0,
            mesh=mesh,
        )
        # len(history) = epochs actually run (a --time-budget stop may end
        # the run early; the checkpoint metadata must not claim cfg.epochs)
        save_checkpoint(args.save, params, loss_history=history,
                        stats=stats.to_dict(), config=vars(args),
                        epoch=len(history))
        logger.print(f"pretrain checkpoint saved to {args.save}.npz (+ stats sidecar)")
        logger.print(f"trainable parameters: {count_trainable(params)}")
    else:
        if not args.load:
            raise SystemExit("finetune phase requires --load with the pretrain checkpoint")
        restored = load_checkpoint(args.load, ckpt_template())
        params = restored["bundle"]["params"]
        # (stats restore happens above: sidecar preferred, manifest
        # fallback — both data normalization and residuals share them)
        # pre-finetune diagnostic suite (cg-hqpinn/...:515-587)
        if not args.no_plots:
            from .data.cz_loader import choose_calibration_subset
            from .utils.plotting import plot_cz_diagnostics

            x_c, _ = choose_calibration_subset(X, Y, cfg.calib_size)
            plot_cz_diagnostics(model.apply, params, X, Y,
                                logger.get_output_dir(), x_calib=x_c)
            logger.print("diagnostic plots written (data_fields/calib_coverage/"
                         "initial_pred_vs_gt/quantum_weights_hist)")
        params, history = run_finetune(model, params, X, Y, stats, cfg, logger=logger)
        save_checkpoint(args.save, params, loss_history=history,
                        stats=stats.to_dict(), config=vars(args), epoch=cfg.finetune_epochs)
        logger.print(f"finetune checkpoint saved to {args.save}.npz")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    args._argv = list(argv) if argv is not None else None
    if args.command == "train":
        return cmd_train(args)
    if args.command == "crystal":
        return cmd_crystal(args)
    if args.command == "cz":
        return cmd_cz(args)
    raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    sys.exit(main())
