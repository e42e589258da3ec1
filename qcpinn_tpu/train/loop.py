"""Jit-compiled physics-informed training.

The reference's Python epoch loop (trainer/diffusion_train.py:52-90) becomes:

- one fused train step (sample -> forward -> PDE residual -> weighted loss ->
  grad -> clip -> Adam -> plateau-scheduler), compiled once;
- ``lax.scan`` over `print_every` steps per dispatch, so the host touches the
  device only at logging boundaries;
- on a device mesh, the collocation batch is sharded over the 'data' axis
  with sharding constraints — gradients are reduced by XLA collectives (the
  psum lives inside the compiled graph).

Samplers draw on-device from a threaded PRNG key (one key per step, folded
from the epoch index) — bitwise reproducible regardless of batch sharding.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import QCPINNConfig
from ..data.diffusion import Sampler
from . import losses as L
from . import optim


@dataclasses.dataclass(frozen=True)
class TermSpec:
    """One loss term: where its points come from, how many, its weight, and
    whether the model output ('value') or the PDE residual ('residual') is
    matched to the sampler's target."""

    sampler: Sampler
    weight: float
    batch: int
    kind: str = "value"  # value | residual


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    sched: optim.PlateauState
    step: int = 0


def diffusion_terms(
    samplers: Dict[str, Sampler],
    batch_size: int,
    weights: Tuple[float, float, float] = (2.0, 4.0, 2.0),
) -> Dict[str, TermSpec]:
    """The canonical diffusion loss (trainer/diffusion_train.py:30-47):
    residual over the full batch, IC and BC1 at batch/3 each, weights
    (w_res, w_bc, w_ic). The reference samples only bcs_sampler[0]; callers
    wanting all four walls pass extra terms."""
    w_r, w_bc, w_ic = weights
    third = max(batch_size // 3, 1)
    return {
        "res": TermSpec(samplers["res"], w_r, batch_size, "residual"),
        "bc": TermSpec(samplers["bc1"], w_bc, third, "value"),
        "ic": TermSpec(samplers["ics"], w_ic, third, "value"),
    }


def make_train_step(
    model_apply: Callable,
    operator: Callable,
    terms: Dict[str, TermSpec],
    optimizer: optax.GradientTransformation,
    config: QCPINNConfig,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    residual_fn: Optional[Callable] = None,
    shots_apply: Optional[Callable] = None,
    quantum_keys: Tuple[str, ...] = ("q",),
    fuse_value_terms: bool = False,
    balancer: str = "none",
):
    """Build (init_state, step_fn, scan_fn).

    ``balancer`` selects the adaptive loss balancing (train/losses.py):

    - ``"none"`` — static TermSpec weights (the reference's default
      2/4/2, trainer/diffusion_train.py:47).
    - ``"uncertainty"`` — homoscedastic AdaptiveMultiLoss
      (si_q_pinn_improved.py:143-164): total = sum_k exp(-s_k) L_k + s_k
      with one TRAINABLE log-variance per term living in
      ``params["loss_log_vars"]`` (inject with
      ``inject_balancer_params``). Replaces the static weights, as in
      the reference.
    - ``"ema"`` — EMAWeights normalized-magnitude balancing
      (CG_HQPINN_IBMtest_16qubits.py:408-423): each term's static weight
      is divided by the EMA of its ratio-to-average magnitude, so
      persistently dominant terms are pulled toward the pack. The EMA
      state lives in ``params["loss_ema"]`` (stop-gradient leaves,
      overwritten each step by the update rule, checkpointed with the
      params — inject with ``inject_balancer_params``).

    Balancers require backprop mode (the SPSA modes perturb every leaf,
    which would corrupt the EMA state / double-count log_vars).

    ``model_apply(params, X) -> [B, out]``; ``operator(apply, X) ->
    (u, residual)`` with ``apply`` already bound to params. When
    ``residual_fn(params, X) -> (u, residual)`` is given it replaces the
    operator for 'residual' terms — this is how the tangent-stream
    residuals (physics/streams.py, params-structured) plug into the same
    jitted step as the generic nested-AD operators.

    ``shots_apply(params, X, key) -> [B, out]`` replaces ``model_apply``
    for 'value' terms — the hardware-fidelity forward (shot-sampled, e.g.
    a solver's ``hw_apply_fn`` with parameter-shift VJP). Residual terms
    always run the exact simulator: state-derivative residuals are not a
    hardware observable, matching the reference where hardware stages
    train data/boundary losses only (readme.md:166-171).

    ``config.gradient_mode == "spsa"`` switches the update from
    value_and_grad to a 2-evaluation SPSA estimate of the full weighted
    loss (train/spsa.py), applied to the ENTIRE params pytree — classical
    trunk included. That is a deliberately simple zeroth-order mode
    (composes with any loss, including shot-sampled value terms); the
    reference's actual hardware recipe is the SPLIT update, available as
    ``gradient_mode == "spsa-split"``: SPSA perturbs only the quantum
    leaves (top-level key(s) ``quantum_keys``) while the classical leaves
    get ordinary Adam steps from a backprop gradient with the quantum
    block frozen (cg-hqpinn/...16q_effective.py:484-512, :727-748). In
    both SPSA modes the plateau scheduler modulates the gains via
    ``lr_scale``; in full-tree 'spsa' the optax chain (clipping, decay)
    does not apply, in 'spsa-split' it applies to the classical partition.
    """
    names = tuple(terms.keys())
    use_plateau = config.scheduler == "plateau"
    use_spsa = config.gradient_mode == "spsa"
    use_spsa_split = config.gradient_mode == "spsa-split"
    if balancer not in ("none", "ema", "uncertainty"):
        raise ValueError(
            f"unknown balancer {balancer!r}; have none, ema, uncertainty"
        )
    if balancer != "none" and (use_spsa or use_spsa_split):
        raise ValueError(
            "adaptive balancers need gradient_mode='backprop' (SPSA "
            "perturbs the balancer state leaves)"
        )
    if use_spsa or use_spsa_split:
        from .spsa import SPSAConfig, spsa_split_step, spsa_step

        spsa_cfg = SPSAConfig(a=config.lr)

    def constrain(x):
        if mesh is not None:
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(data_axis))
            )
        return x

    # The step is latency-bound on the circuit's sequential op chain
    # (PARITY.md round-4 roofline study), so every independent
    # model_apply costs a full chain traversal regardless of its batch
    # size. Concatenating all exact value terms (BC/IC walls) into ONE
    # apply removes len(value_terms)-1 forward+backward traversals per
    # step. OPT-IN (default False): fusing reorders float accumulation,
    # so recorded trajectories only stay bit-stable when the caller
    # chooses it explicitly — train() opts in for point-decoupled
    # models. Never applied to batch-coupled models (the Hopfield
    # baseline self-associates over the batch — fusing would change
    # semantics) or in shots mode (each term samples with its own
    # fold_in key).
    value_names = tuple(n for n in names if terms[n].kind != "residual")
    fuse_values = (
        fuse_value_terms and shots_apply is None and len(value_names) > 1
    )

    def loss_fn(params, batches, k_shot):
        per_term = {}
        for i, name in enumerate(names):
            if fuse_values and name in value_names:
                continue
            X, y = batches[name]
            if terms[name].kind == "residual":
                if residual_fn is not None:
                    _, pred = residual_fn(params, X)
                else:
                    apply = lambda Xp: model_apply(params, Xp)
                    _, pred = operator(apply, X)
            elif shots_apply is not None:
                pred = shots_apply(params, X, jax.random.fold_in(k_shot, i))
            else:
                pred = model_apply(params, X)
            per_term[name] = L.mse(pred, y)
        if fuse_values:
            preds = model_apply(
                params,
                jnp.concatenate([batches[n][0] for n in value_names], axis=0),
            )
            ofs = 0
            for n in value_names:
                b = batches[n][0].shape[0]
                per_term[n] = L.mse(preds[ofs : ofs + b], batches[n][1])
                ofs += b
        if balancer == "uncertainty":
            # sum exp(-s_k) L_k + s_k on the RAW term losses: the
            # log-variances replace the static weights, as the reference's
            # AdaptiveMultiLoss does (si_q_pinn_improved.py:143-164)
            total = L.uncertainty_combine(params["loss_log_vars"], per_term)
            return total, (per_term, None)
        if balancer == "ema":
            detached = {
                k: jax.lax.stop_gradient(v) for k, v in per_term.items()
            }
            new_ema = L.ema_weights_update(params["loss_ema"], detached)
            total = sum(
                terms[n].weight * per_term[n]
                / jnp.maximum(jax.lax.stop_gradient(new_ema[n]), 1e-8)
                for n in names
            )
            return total, (per_term, new_ema)
        total = sum(terms[n].weight * per_term[n] for n in names)
        return total, (per_term, None)

    def step_fn(state_tuple, xs):
        params, opt_state, sched = state_tuple
        key, step_id = xs
        k_batch, k_shot, k_spsa = jax.random.split(key, 3)
        keys = jax.random.split(k_batch, len(names))
        batches = {}
        for name, k in zip(names, keys):
            X, y = terms[name].sampler.sample(k, terms[name].batch)
            batches[name] = (constrain(X), constrain(y))

        if use_spsa:
            # per-term metrics ride the two SPSA evaluations (has_aux) —
            # no third loss evaluation; the step cost stays at SPSA's
            # 2-evals-per-step hardware budget
            params, loss, (per_term, _) = spsa_step(
                lambda p, kk: loss_fn(p, batches, kk),
                params,
                step_id.astype(jnp.float32) + 1.0,
                k_spsa,
                spsa_cfg,
                has_aux=True,
                # the plateau scale modulates SPSA's gain a_k so the
                # scheduler (and the logged lr_scale) stays in effect in
                # this mode too; the optax chain (clipping/decay) does not
                # apply to SPSA's zeroth-order updates — see docstring
                lr_scale=sched.scale if use_plateau else 1.0,
            )
        elif use_spsa_split:
            params, opt_state, loss, (per_term, _) = spsa_split_step(
                lambda p, kk: loss_fn(p, batches, kk),
                params,
                step_id.astype(jnp.float32) + 1.0,
                k_spsa,
                spsa_cfg,
                optimizer,
                opt_state,
                quantum_keys=quantum_keys,
                has_aux=True,
                lr_scale=sched.scale if use_plateau else 1.0,
            )
        else:
            (loss, (per_term, new_ema)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batches, k_shot)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            if use_plateau:
                updates = optim.scale_updates(updates, sched.scale)
            params = optax.apply_updates(params, updates)
            if balancer == "ema":
                # the EMA state is updated by its own rule, not by the
                # optimizer (its gradient is zero by stop_gradient; the
                # optax update above is overwritten here)
                params = {**params, "loss_ema": new_ema}
        if use_plateau:
            sched = optim.plateau_update(
                sched,
                loss,
                factor=config.plateau_factor,
                patience=config.effective_plateau_patience,
            )
        metrics = dict(per_term)
        metrics["loss"] = loss
        metrics["lr_scale"] = sched.scale
        return (params, opt_state, sched), metrics

    @functools.partial(jax.jit, static_argnums=(5,))
    def scan_steps(params, opt_state, sched, base_key, start_step, n_steps):
        """Run n_steps (static) fused steps; returns final state + the metric
        trace [n_steps]."""
        step_ids = start_step + jnp.arange(n_steps)
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(step_ids)
        (params, opt_state, sched), trace = jax.lax.scan(
            step_fn, (params, opt_state, sched), (keys, step_ids)
        )
        return params, opt_state, sched, trace

    return step_fn, scan_steps


def inject_balancer_params(params: dict, terms, balancer: str) -> dict:
    """Add the balancer's state leaves to the params pytree (no-op for
    'none' or when already present, e.g. on resume): trainable
    log-variances for 'uncertainty', stop-gradient EMA state for 'ema'."""
    if balancer == "uncertainty" and "loss_log_vars" not in params:
        return {**params, "loss_log_vars": L.uncertainty_init(terms.keys())}
    if balancer == "ema" and "loss_ema" not in params:
        return {**params, "loss_ema": L.ema_weights_init(terms.keys())}
    return params


def make_val_fn(model_apply: Callable, X_val, y_val) -> Callable:
    """Jitted validation MSE on a fixed set, for best-val tracking."""

    @jax.jit
    def val_fn(params):
        pred = model_apply(params, X_val)
        return jnp.mean((pred - y_val) ** 2)

    return val_fn


def train(
    model,
    config: QCPINNConfig,
    terms: Dict[str, TermSpec],
    operator: Callable,
    logger=None,
    mesh: Optional[Mesh] = None,
    checkpoint_fn: Optional[Callable] = None,
    resume: Optional[dict] = None,
    val_fn: Optional[Callable] = None,
) -> Tuple[dict, list]:
    """Full training driver. Returns (params, loss_history).

    ``resume`` restores {params, opt_state, sched, step} from a checkpoint
    bundle (utils.checkpoint), continuing the PRNG stream from ``step`` —
    the reference's --start-epoch/--load capability
    (cg-hqpinn/...:802-804).

    ``val_fn(params) -> scalar`` enables best-validation tracking
    (si_q_pinn_improved.py:608-624): it is evaluated at every logging chunk,
    the params with the lowest value seen are kept, and those — not the
    final ones — are returned. Build one with ``make_val_fn``.
    """
    import os as _os

    def log(msg):
        if logger is not None:
            logger.print(msg)

    key = jax.random.PRNGKey(config.seed)
    k_init, k_train = jax.random.split(key)
    params = model.init(k_init)
    balancer = getattr(config, "loss_balancer", "none")
    params = inject_balancer_params(params, terms, balancer)
    if balancer != "none":
        log(f"adaptive loss balancer: {balancer} (train/losses.py; "
            "uncertainty replaces the static term weights, ema divides "
            "them by each term's EMA ratio-to-average)")

    optimizer = optim.make_optimizer(
        config.lr,
        grad_clip=config.effective_grad_clip,
        schedule=config.scheduler,
        epochs=config.epochs,
        weight_decay=config.effective_weight_decay,
    )
    quantum_keys = tuple(getattr(model, "quantum_param_keys", ("q",)))
    if config.gradient_mode == "spsa-split":
        # the optax chain covers only the classical partition — SPSA owns
        # the quantum leaves (cg-hqpinn/...16q_effective.py:700-748)
        from .spsa import split_params

        q_part, c_part = split_params(params, quantum_keys)
        if not q_part:
            raise ValueError(
                "gradient_mode='spsa-split' needs quantum parameters "
                f"(top-level key(s) {quantum_keys}); the "
                f"{config.solver} solver has none — use 'backprop' or 'spsa'"
            )
        opt_state = optimizer.init(c_part)
    else:
        opt_state = optimizer.init(params)
    sched = optim.plateau_init()
    start_step = 0
    if resume is not None:
        params = inject_balancer_params(resume["params"], terms, balancer)
        if resume.get("opt_state") is not None:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state),
                jax.tree_util.tree_leaves(resume["opt_state"]),
            )
        if resume.get("sched") is not None:
            sched = optim.PlateauState(*jax.tree_util.tree_leaves(resume["sched"]))
        start_step = int(resume.get("step", 0))

    profile_dir = _os.environ.get("QCPINN_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # hardware-fidelity gradient modes (readme.md:166-171): simulator =
    # backprop on analytic expectations; hardware = parameter-shift on
    # shot-sampled measurements; SPSA = 2-eval zeroth order.
    shots_apply = None
    if config.gradient_mode == "parameter-shift":
        if not hasattr(model, "hw_apply_fn"):
            raise ValueError(
                "gradient_mode='parameter-shift' needs a solver with a "
                "hardware apply (DVSolver.hw_apply_fn); CV/Classical "
                "solvers train with backprop or spsa"
            )
        shots_apply = model.hw_apply_fn(config.shots)
        log(
            f"parameter-shift gradients on value terms (shots={config.shots}); "
            "residual terms use the exact simulator (hardware stages are "
            "data/boundary-only, as in the reference)"
        )
    elif config.gradient_mode in ("spsa", "spsa-split"):
        if config.shots is not None:
            if config.solver == "DV":
                shots_apply = lambda p, X, k: model.apply(
                    p, X, shots=config.shots, key=k
                )
            else:
                log("shots apply only to the DV solver's measurements; "
                    "SPSA runs on the analytic forward")
        if config.gradient_mode == "spsa-split":
            log(
                f"split updates: SPSA (a={config.lr}) on quantum leaves "
                f"{quantum_keys}, Adam on the classical partition "
                f"(the reference's hardware recipe); shots={config.shots}"
            )
        else:
            log(f"SPSA updates on the FULL pytree (a={config.lr}); "
                f"shots={config.shots}")
    elif config.shots is not None:
        log(
            f"shots={config.shots} ignored: backprop mode trains on analytic "
            "expectations (the reference's AER semantics — 'Ignored in AER "
            "analytic mode'); use gradient_mode='parameter-shift' or 'spsa' "
            "for shot-noise training"
        )

    _, scan_steps = make_train_step(
        model.apply, operator, terms, optimizer, config, mesh=mesh,
        shots_apply=shots_apply, quantum_keys=quantum_keys,
        fuse_value_terms=not getattr(model, "batch_coupled", False),
        balancer=balancer,
    )

    loss_history = []
    best_val = float("inf")
    best_params = None
    chunk = max(1, min(config.print_every, config.epochs))
    done = start_step
    t0 = time.time()
    n_chunks = (max(config.epochs - start_step, 0) + chunk - 1) // chunk
    for _ in range(n_chunks):
        n = min(chunk, config.epochs - done)
        params, opt_state, sched, trace = scan_steps(
            params, opt_state, sched, k_train, done, n
        )
        done += n
        trace = jax.device_get(trace)
        loss_history.extend([float(v) for v in trace["loss"]])
        elapsed = time.time() - t0
        eta = elapsed / done * (config.epochs - done)
        term_str = " | ".join(
            f"{name}: {float(trace[name][-1]):.2e}"
            for name in terms
        )
        val_str = ""
        if val_fn is not None:
            v = float(jax.device_get(val_fn(params)))
            if v < best_val:
                best_val, best_params = v, params
                val_str = f" | val: {v:.2e} (best)"
            else:
                val_str = f" | val: {v:.2e} (best {best_val:.2e})"
        log(
            f"Epoch: {done}/{config.epochs} | Loss: {loss_history[-1]:.2e} | "
            f"{term_str} | lr_scale: {float(trace['lr_scale'][-1]):.2e}"
            f"{val_str} | Total: {elapsed:.1f}s | ETA: {eta:.1f}s"
        )
        if checkpoint_fn is not None:
            checkpoint_fn(params, opt_state, done, loss_history)
    if profile_dir:
        jax.profiler.stop_trace()
        log(f"profiler trace written to {profile_dir}")
    if best_params is not None:
        log(f"restoring best-validation params (val={best_val:.2e})")
        params = best_params
    return params, loss_history
