"""CV-solver trainability diagnosis (round-4 VERDICT item #1).

The only end-to-end CV artifacts so far show rel-L2 ~92-94% after thousands
of epochs (artifacts/cv_diffusion_class{1,2}.json), while the DV solver at
the identical sandwich/recipe reaches ~33% in 3k epochs. The training logs
show the *PINN residual* term oscillating 0.15<->8.5 between epochs with a
flat validation MSE — which looks like an ill-conditioned residual, not a
dead engine. This script separates the two hypotheses with measured probes:

  A (init forensics)   — per-term losses, per-group gradient norms, and the
                         curvature of the middle layer (max |d2z/dr2|) at
                         init, DV vs CV1 vs CV2 at the same sandwich. If the
                         CV residual term or its curvature is orders of
                         magnitude above DV's, the stall is conditioning.
  B (supervised probe) — drop the PDE residual entirely and fit the analytic
                         solution by plain MSE. If the CV network fits
                         (rel-L2 << 90%), the Fock engine and its gradients
                         are fine and the PINN *recipe*, not the engine, is
                         what fails.
  C (recipe probe)     — short PINN runs with the levers the reference has
                         (grad clip 0.1 is already on for CV): lower lr and
                         the uncertainty balancer, to see whether any recipe
                         moves the validation MSE at all in 1.5k epochs.

Reference anchors: nn/CVPDESolver.py:22-49 (the CV solver is a first-class
peer of DV), trainer/diffusion_train.py:82-85 (CV grad clip 0.1),
nn/CVNeuralNetwork1.py:24-25 (active_sd=1e-4 near-vacuum init).

Run on CPU (the Fock dim at 4 modes / cutoff 6 is 1296):
  JAX_PLATFORMS=cpu python scripts/cv_diagnosis.py --probe A
  JAX_PLATFORMS=cpu python scripts/cv_diagnosis.py --probe B --steps 1500
Writes artifacts/cv_diagnosis_<probe>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the image's axon TPU plugin ignores JAX_PLATFORMS from the environment, so
# the platform is pinned here before any jax use. Default is CPU (a diagnostic
# at 4 modes / cutoff 6 -> Fock dim 1296 must not contend with training runs
# on the single real chip); `--platform tpu` opts a long PINN probe onto the
# chip (probe C ran there at ~4.6 s/epoch vs ~12 s/epoch on CPU).
_platform = "cpu"
if "--platform" in sys.argv:
    _platform = sys.argv[sys.argv.index("--platform") + 1]
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
# else: leave the default resolution, which picks the real chip (exposed as
# the experimental 'axon' platform — pinning 'tpu' by name fails here)

import jax.numpy as jnp
import optax

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.data import diffusion as dd
from qcpinn_tpu.models import DVSolver
from qcpinn_tpu.models.cv_solver import CVSolver
from qcpinn_tpu.physics import get_operator
from qcpinn_tpu.utils.evaluation import evaluate_relative_l2


def make_cfg(solver: str, cv_class: int = 1, **kw) -> QCPINNConfig:
    return QCPINNConfig(
        problem="diffusion",
        solver=solver,
        classic_network=(3, 50, 1),
        num_qubits=4,
        num_quantum_layers=1,
        cv_class=cv_class,
        cutoff_dim=6,
        seed=0,
        **kw,
    )


def build(solver: str, cv_class: int = 1):
    cfg = make_cfg(solver, cv_class)
    model = {"DV": DVSolver, "CV": CVSolver}[solver](cfg)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    return cfg, model, params


def pinn_loss_fn(model_apply, operator, samplers, key, batch=64):
    """The canonical 2/4/2 diffusion loss at one sampled batch
    (train/loop.diffusion_terms)."""
    kr, kb, ki = jax.random.split(key, 3)
    Xr, tr = samplers["res"].sample(kr, batch)
    Xb, tb = samplers["bc1"].sample(kb, batch // 3)
    Xi, ti = samplers["ics"].sample(ki, batch // 3)

    def loss(params):
        apply = lambda X: model_apply(params, X)
        _, res = operator(apply, Xr)
        l_res = jnp.mean((res - tr) ** 2)
        l_bc = jnp.mean((apply(Xb) - tb) ** 2)
        l_ic = jnp.mean((apply(Xi) - ti) ** 2)
        return 2.0 * l_res + 4.0 * l_bc + 2.0 * l_ic, (l_res, l_bc, l_ic)

    return loss


def group_norms(grads):
    out = {}
    for k, v in grads.items():
        leaves = jax.tree_util.tree_leaves(v)
        out[k] = float(
            jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
        )
    return out


def probe_a():
    samplers = dd.gaussian_pulse_samplers()
    operator = get_operator("diffusion", "fwd")
    key = jax.random.PRNGKey(7)
    report = {}
    for name, (solver, cv_class) in {
        "DV": ("DV", 1), "CV1": ("CV", 1), "CV2": ("CV", 2), "CV3": ("CV", 3),
    }.items():
        cfg, model, params = build(solver, cv_class)
        loss = pinn_loss_fn(model.apply, operator, samplers, key)
        (total, (l_res, l_bc, l_ic)), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(params)

        # curvature probe of the FULL u(x): second derivative of the scalar
        # output along the x coordinate at a grid of points — this is what
        # the diffusion residual consumes
        X = jnp.stack(
            [jnp.full((41,), 0.5), jnp.linspace(0.0, 1.0, 41),
             jnp.full((41,), 0.5)], axis=1)

        def u_scalar(x1, x0, x2):
            p = jnp.stack([x0, x1, x2])[None, :]
            return model.apply(params, p)[0, 0]

        d2 = jax.jit(jax.vmap(
            lambda row: jax.grad(jax.grad(u_scalar))(row[1], row[0], row[2])
        ))(X)
        report[name] = {
            "loss_total": float(total),
            "loss_res": float(l_res),
            "loss_bc": float(l_bc),
            "loss_ic": float(l_ic),
            "grad_norms": group_norms(grads),
            "u_xx_mean_abs": float(jnp.mean(jnp.abs(d2))),
            "u_xx_max_abs": float(jnp.max(jnp.abs(d2))),
        }
        print(name, json.dumps(report[name]))
    return report


def probe_b(steps: int, lr: float = 5e-3):
    """Supervised-only: fit dd.u by MSE. No PDE residual anywhere."""
    report = {}
    for name, (solver, cv_class) in {
        "DV": ("DV", 1), "CV1": ("CV", 1), "CV2": ("CV", 2),
    }.items():
        cfg, model, params = build(solver, cv_class)
        tx = optax.chain(optax.clip_by_global_norm(cfg.effective_grad_clip),
                         optax.adam(lr))
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key):
            X = jax.random.uniform(key, (256, 3))
            y = dd.u(X)

            def loss(p):
                return jnp.mean((model.apply(p, X) - y) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        t0, hist = time.time(), []
        for i in range(steps):
            params, opt, l = step(params, opt,
                                  jax.random.fold_in(jax.random.PRNGKey(3), i))
            if i % 100 == 0:
                hist.append(float(l))
                print(f"{name} step {i} mse {float(l):.3e}")
        m = evaluate_relative_l2(model.apply, params, dd.u, num=20)
        report[name] = {
            "steps": steps, "lr": lr, "mse_trace": hist,
            "final_mse": float(l), "rel_l2_u_percent": m["rel_l2_u_percent"],
            "seconds": round(time.time() - t0, 1),
        }
        print(name, json.dumps(report[name]))
    return report


def probe_c(steps: int, batch: int = 256):
    """Short PINN runs through the real train loop with recipe levers.

    ``--batch`` exists for the precision A/B (probe E in spirit): run the
    SAME reduced config once per Fock dtype —

      python scripts/cv_diagnosis.py --probe C --steps 200 --batch 64 \\
          --out artifacts/cv_diagnosis_E_c64.json
      JAX_ENABLE_X64=1 QCPINN_FOCK_DTYPE=complex128 \\
      python scripts/cv_diagnosis.py --probe C --steps 200 --batch 64 \\
          --out artifacts/cv_diagnosis_E_c128.json

    If the double-precision arm reproduces the complex64 loss trace (stuck
    at the forcing floor), the ~1e-2 complex64 gradient noise measured by
    scripts/cv_gradcheck.py is exonerated as a cause of the CV-PINN stall,
    leaving the curvature-ceiling mechanism as the sole explanation.
    """
    from qcpinn_tpu.ops import fock
    from qcpinn_tpu.train import TermSpec, train
    from qcpinn_tpu.train.loop import diffusion_terms

    samplers = dd.gaussian_pulse_samplers()
    report = {}
    # Probe B showed the stall is variant-specific: CV2 (<x> readout,
    # active_sd 0.1) fits a supervised target after a ~1000-step plateau
    # while CV1's near-vacuum <n> path stays stuck. The PINN-side probe
    # therefore asks ONE question — does the full PINN recipe move for
    # CV2 at the batch size the supervised breakthrough used (256)?
    # (The uncertainty-balancer lever already has its own A/B,
    # artifacts/balancer_ab_*.json.) The recorded artifact
    # (cv_diagnosis_C.json) ran this on the real chip at 500 epochs
    # (~4.6 s/epoch; the CPU Fock step at B=256 is ~12 s/epoch).
    for tag, kw in {
        f"cv2_b{batch}": dict(cv_class=2, lr=5e-3, batch_size=batch),
    }.items():
        cfg = make_cfg("CV", epochs=steps,
                       print_every=max(steps // 10, 1), **kw)
        model = CVSolver(cfg)
        terms = diffusion_terms(samplers, cfg.batch_size, cfg.loss_weights)
        operator = get_operator("diffusion", "fwd")
        params, history = train(model, cfg, terms, operator)
        m = evaluate_relative_l2(model.apply, params, dd.u, num=20)
        report[tag] = {
            "fock_dtype": str(jnp.dtype(fock.CDTYPE)),
            "x64": bool(jax.config.jax_enable_x64),
            "final_loss": float(history[-1]),
            "loss_trace": [float(h) for h in history[:: max(steps // 20, 1)]],
            "rel_l2_u_percent": m["rel_l2_u_percent"],
        }
        print(tag, json.dumps(report[tag]))
    return report


def probe_d(steps: int):
    """v3x: variant-3 gates (CubicPhase non-Gaussianity, CrossKerr,
    learnable encoding scale) + the 'x' readout + v2's active_sd=0.1 —
    the configuration the probe-C mechanism analysis predicts could break
    the quasi-affine curvature ceiling of Gaussian CV circuits under PINN
    training (the reference never ships this combination; the readout
    knob is the round-5 CVLayer extension)."""
    from qcpinn_tpu.models.cv_layer import CVLayer
    from qcpinn_tpu.train import train
    from qcpinn_tpu.train.loop import diffusion_terms

    samplers = dd.gaussian_pulse_samplers()
    cfg = make_cfg("CV", epochs=steps, print_every=max(steps // 25, 1),
                   cv_class=3, lr=5e-3, batch_size=256)
    model = CVSolver(cfg)
    model.cv = CVLayer(num_qumodes=model.m,
                       num_layers=cfg.num_quantum_layers,
                       cutoff_dim=cfg.cutoff_dim, variant=3, readout="x",
                       active_sd=0.1)
    terms = diffusion_terms(samplers, cfg.batch_size, cfg.loss_weights)
    operator = get_operator("diffusion", "fwd")
    params, history = train(model, cfg, terms, operator)
    m = evaluate_relative_l2(model.apply, params, dd.u, num=20)
    report = {"cv3x_b256": {
        "steps": steps,
        "config": "variant 3 gates + readout x + active_sd 0.1, lr 5e-3, B=256",
        "final_loss": float(history[-1]),
        "loss_trace": [float(h) for h in history[:: max(steps // 20, 1)]],
        "rel_l2_u_percent": m["rel_l2_u_percent"],
    }}
    print("cv3x_b256", json.dumps(report["cv3x_b256"]))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=["A", "B", "C", "D"], required=True)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="consumed at import time (see module header)")
    ap.add_argument("--batch", type=int, default=256,
                    help="probe-C batch size (the precision A/B uses 64)")
    args = ap.parse_args()
    fn = {"A": probe_a, "B": lambda: probe_b(args.steps),
          "C": lambda: probe_c(args.steps, args.batch),
          "D": lambda: probe_d(args.steps)}[args.probe]
    report = fn()
    out = args.out or f"artifacts/cv_diagnosis_{args.probe}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
