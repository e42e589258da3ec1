"""Two-phase Czochralski training pipeline
(CG_HQPINN_IBMtest_16qubits.py:471-613), TPU-native.

Phase "pretrain" (the reference's Aer stage): exact simulation, Adam +
per-epoch cosine annealing, EMA-normalized physics weighting with
warmup+ramp, minibatches over the COMSOL dataset — one jitted fused step
(data+physics loss, EMA update, Adam) dispatched asynchronously over
host-looped batches (a whole-epoch lax.scan measured 6.8x slower on v5e:
the compiler schedules the remat/AD graph far more conservatively inside
a scan body).

Phase "finetune" (the reference's IBM stage): shot-sampled measurements
(the hardware-fidelity mode replacing the cloud QPU), data-MSE only on a
coverage-chosen calibration subset, head-only (gradient-masked) or full
scope. The checkpoint carries the normalization stats — the load-bearing
handoff artifact (:443-464).

Finetune gradients: head scope differentiates the exact head through the
stop-gradient sampled measurement (the reference's freeze_for_ibm_head_tuning
path); full scope routes the circuit through the parameter-shift estimator
(train/hardware_grad.make_hw_apply_cz — the reference's
diff_method="parameter-shift" QNode), so quantum weights and the classical
trunk both receive real shot-noise gradients.

Deviation from the reference (documented): batches are drop_last=True so
the epoch is a fixed-shape scan (the reference keeps the ragged final batch;
points land in other epochs via reshuffling).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.cz_loader import DataStats, choose_calibration_subset
from ..models.czochralski import Hybrid16QPINN
from ..physics.cylindrical import cz_residuals
from ..physics.operators_fwd import cz_residuals_fwd

PHYS_KEYS = ("cont", "mom_r", "mom_z", "swirl", "energy")


@dataclasses.dataclass
class CzConfig:
    # defaults track the reference flagship CLI
    # (CG_HQPINN_IBMtest_16qubits.py:627-648)
    n_qubits: int = 16
    n_layers: int = 2
    epochs: int = 2000
    batch_size: int = 16
    lr: float = 1e-3
    seed: int = 42
    re: float = 15.0
    pr: float = 28.463
    gr: float = 8000.0
    physics_weight: float = 0.05
    physics_warmup: int = 150
    physics_ramp: int = 400
    ema_beta: float = 0.95
    log_every: int = 10
    # finetune phase
    finetune_epochs: int = 100
    finetune_lr: float = 1e-4
    shots: Optional[int] = 4096
    calib_size: int = 8
    train_scope: str = "head"  # head | full
    # FakeSherbrooke-style noisy-simulator finetune (the reference's
    # --phase ibm-sim, cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:183-196)
    noise_depolarizing: float = 0.0
    noise_readout: float = 0.0
    # depth-aware per-gate depolarizing (ops/measure.py): error grows
    # with reupload-layer count like the reference's FakeSherbrooke
    noise_per_gate: float = 0.0
    # 'fwd' = forward-mode residuals (fast; the Cz model is point-decoupled);
    # 'rev' = torch-equivalent reverse mode
    physics_mode: str = "fwd"
    # Physics-vs-data balancing:
    #   'reference' — the reference's EMAWeights scheme
    #     (CG_HQPINN_IBMtest_16qubits.py:408-422,:510-513): each term's EMA
    #     of its ratio to the all-term average. When raw residuals dwarf the
    #     data loss (pressure_coeff=134k enters mom_r/mom_z, so the squared
    #     residual opens at ~1e12 vs data ~1e-1), the average is itself
    #     physics-dominated and the normalization cancels out: the loss is
    #     effectively pure physics, and a 300-epoch real-data run measurably
    #     collapses the fit to the constant field means (data 9.8e-5 at the
    #     end of warmup -> 3.8e-2 after the ramp; every field's rel-L2 at
    #     the predict-the-mean floor).
    #   'balanced' — scale physics to the data loss via absolute-magnitude
    #     EMAs: scaled = w * phys_total * sg(ema_data / ema_phys), so
    #     physics always contributes ~w of the data-loss magnitude and can
    #     regularize but never crush the fit.
    #   'coupled' — the reference prototype's CoupledAdaptiveWeighting
    #     (modified_qpinn_cg.py:142-156): a TRAINABLE data-noise scale
    #     eps_d with physics pinned at eps_p = eps_d*sqrt(coupled_ratio),
    #     total = l_data/(2 eps_d^2) + l_phys/(2 eps_p^2) + log(eps_d eps_p).
    #     The warmup/ramp still gates the physics term; physics_weight is
    #     unused (the learned eps plays that role). The balancer leaf
    #     ('loss_bal') is a training artifact, stripped from checkpoints.
    physics_normalize: str = "reference"
    coupled_ratio: float = 100.0
    # rematerialize the circuit in reverse mode: None = auto (on for
    # batch > 256, where unremat per-gate intermediates exceed one v5e's
    # HBM; off below — measured 32% faster when it fits)
    remat: Optional[bool] = None
    # Per-field data-loss weights over (u_r, u_z, u_theta, p, T), or None
    # for uniform MSE (the reference's loss). Normalized to mean 1, so the
    # data-loss magnitude — and therefore the EMA physics balance — is
    # unchanged; only the per-field gradient allocation shifts. Not in the
    # reference: an accuracy lever for the small-magnitude velocity
    # components, which equal-weight MSE demonstrably under-fits
    # (PARITY.md field table: u_r/u_theta carry ~100x the rel-L2 of p/T).
    field_weights: Optional[Tuple[float, ...]] = None

    @property
    def effective_remat(self) -> bool:
        return self.batch_size > 256 if self.remat is None else self.remat

    def norm_field_weights(self):
        """field_weights as a mean-1 jnp row vector, or None."""
        if self.field_weights is None:
            return None
        w = jnp.asarray(self.field_weights, jnp.float32)
        if w.ndim != 1 or w.size != 5:
            raise ValueError("field_weights must be 5 values (u_r,u_z,u_theta,p,T)")
        if any(v < 0 for v in self.field_weights) or sum(self.field_weights) <= 0:
            # a zero sum would divide to inf/NaN; a negative weight flips
            # that field's loss into a reward — both are config errors
            raise ValueError(
                "field_weights must be non-negative with a positive sum, "
                f"got {self.field_weights}"
            )
        return w * (w.size / jnp.sum(w))


def _cosine_lr(base_lr: float, epoch: jnp.ndarray, t_max: int) -> jnp.ndarray:
    return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max(t_max, 1)))


def make_pretrain_epoch(
    model: Hybrid16QPINN,
    X: np.ndarray,
    Y: np.ndarray,
    stats: DataStats,
    cfg: CzConfig,
    mesh=None,
):
    """Build the jitted one-epoch function. State: (params, opt_state, ema).

    ``mesh`` (a jax Mesh with a 'data' axis) data-parallelizes the step:
    the node batch is pinned to ``P('data', None)`` and XLA partitions the
    whole step — forward, residuals, grads (reduced across devices by the
    inserted psum) — exactly like the diffusion trainer's mesh path
    (train/loop.py). Trajectory-identical to single-device (tested)."""
    n_batches = len(X) // cfg.batch_size
    if n_batches == 0:
        raise ValueError("batch_size larger than dataset")
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        if cfg.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide over the "
                f"'data' axis of {mesh.shape['data']} devices"
            )
        _batch_sharding = batch_sharding(mesh, ndim=2)

        def _shard_batch(t):
            return jax.lax.with_sharding_constraint(t, _batch_sharding)
    else:
        def _shard_batch(t):
            return t
    # Keep the FULL dataset on device; each epoch's permutation is over all
    # rows and the per-epoch remainder (len(X) mod batch) is dropped after
    # shuffling, so the dropped rows rotate across epochs instead of the
    # same tail being excluded from every epoch.
    Xd = jnp.asarray(X)
    Yd = jnp.asarray(Y)

    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(),
        optax.scale(-1.0),  # lr injected per epoch below
    )

    residual_fn = cz_residuals if cfg.physics_mode == "rev" else cz_residuals_fwd

    fw = cfg.norm_field_weights()

    # physics_weight == 0 is a static supervised/data-only mode: the PDE
    # residual graph (the expensive ~85% of the step: forward-mode second
    # derivatives through the 16q circuit) is never built, so capacity
    # probes and pure-data fits run ~6x faster per epoch.
    data_only = cfg.physics_weight == 0.0

    def batch_loss(params, xb, yb, ema, phys_w):
        xb = _shard_batch(xb)
        yb = _shard_batch(yb)
        pred = model.apply(params, xb)
        sq = (pred - yb) ** 2
        data_loss = jnp.mean(sq if fw is None else sq * fw)
        if data_only:
            phys_total = jnp.float32(0.0)
            phys_terms = {k: jnp.float32(0.0) for k in PHYS_KEYS}
        else:
            phys_total, phys_terms = residual_fn(
                lambda Xp: model.apply(params, Xp),
                xb,
                stats.pressure_coeff,
                cfg.re,
                cfg.pr,
                cfg.gr,
            )
        # EMA-normalized physics weight (:510-513): weights are EMA'd
        # relative magnitudes; only the *mean physics weight* scales the loss.
        detached = {
            "data": jax.lax.stop_gradient(data_loss),
            **{k: jax.lax.stop_gradient(v) for k, v in phys_terms.items()},
        }
        avg = jnp.maximum(sum(detached.values()) / len(detached), 1e-12)
        new_ema = {
            k: cfg.ema_beta * ema[k] + (1.0 - cfg.ema_beta) * (v / avg)
            for k, v in detached.items()
        }
        # absolute-magnitude EMAs for the 'balanced' mode (converge in
        # ~1/(1-beta) steps, well inside the physics warmup)
        new_ema["abs_data"] = (
            cfg.ema_beta * ema["abs_data"] + (1.0 - cfg.ema_beta) * detached["data"]
        )
        new_ema["abs_phys"] = (
            cfg.ema_beta * ema["abs_phys"]
            + (1.0 - cfg.ema_beta) * jax.lax.stop_gradient(phys_total)
        )
        if cfg.physics_normalize == "coupled":
            from ..models.si_gated import coupled_weighting_apply

            # ramp in [0, 1] gates the physics term exactly as the other
            # modes' warmup does; the magnitudes come from the learned eps
            ramp = phys_w / jnp.maximum(cfg.physics_weight, 1e-12)
            total = coupled_weighting_apply(
                params["loss_bal"], data_loss, phys_total * ramp,
                target_ratio=cfg.coupled_ratio,
            )
        elif cfg.physics_normalize == "balanced":
            scale = new_ema["abs_data"] / jnp.maximum(new_ema["abs_phys"], 1e-30)
            scaled_phys = phys_w * phys_total * jax.lax.stop_gradient(scale)
            total = data_loss + scaled_phys
        else:
            mean_phys_w = sum(new_ema[k] for k in PHYS_KEYS) / len(PHYS_KEYS)
            scaled_phys = phys_w * (phys_total / jnp.maximum(mean_phys_w, 1e-12))
            total = data_loss + scaled_phys
        return total, (data_loss, phys_total, new_ema)

    @jax.jit
    def step_fn(params, opt_state, ema, xb, yb, phys_w, lr):
        (total, (dl, pl, ema)), grads = jax.value_and_grad(
            batch_loss, has_aux=True
        )(params, xb, yb, ema, phys_w)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, ema, (total, dl, pl)

    @jax.jit
    def shuffle(key):
        perm = jax.random.permutation(key, len(Xd))[: n_batches * cfg.batch_size]
        return (
            Xd[perm].reshape(n_batches, cfg.batch_size, -1),
            Yd[perm].reshape(n_batches, cfg.batch_size, -1),
        )

    # XLA:CPU's in-process collectives use a rendezvous with a hard 40 s
    # liveness timeout; a host loop that async-dispatches tens of sharded
    # steps floods it and the process aborts (observed at ~55 queued steps
    # on the 8-device virtual mesh; 10 are fine). Real TPU collectives are
    # hardware-managed and unaffected, so only CPU meshes pay the per-step
    # sync.
    sync_each_step = (
        mesh is not None and next(iter(mesh.devices.flat)).platform == "cpu"
    )

    def epoch_fn(params, opt_state, ema, epoch_idx, key):
        # One jitted step, batches looped on the host (dispatch is async and
        # ~1000x cheaper than a 16q step; a whole-epoch lax.scan measured 4x
        # SLOWER on v5e — the compiler scheduled the remat/AD graph far more
        # conservatively inside the scan body).
        e = float(epoch_idx)
        ramp = min(max((e - cfg.physics_warmup) / max(cfg.physics_ramp, 1), 0.0), 1.0)
        phys_w = jnp.float32(cfg.physics_weight * ramp)
        lr = jnp.float32(_cosine_lr(cfg.lr, e, cfg.epochs))
        Xs, Ys = shuffle(key)
        totals, datas, physes = [], [], []
        for i in range(n_batches):
            params, opt_state, ema, (t, d, p) = step_fn(
                params, opt_state, ema, Xs[i], Ys[i], phys_w, lr
            )
            if sync_each_step:
                jax.block_until_ready(t)
            totals.append(t)
            datas.append(d)
            physes.append(p)
        metrics = {
            "loss": jnp.mean(jnp.stack(totals)),
            "data": jnp.mean(jnp.stack(datas)),
            "phys": jnp.mean(jnp.stack(physes)),
            "phys_w": phys_w,
            "lr": lr,
        }
        return params, opt_state, ema, metrics

    return optimizer, epoch_fn, n_batches


def run_pretrain(
    model: Hybrid16QPINN,
    X: np.ndarray,
    Y: np.ndarray,
    stats: DataStats,
    cfg: CzConfig,
    logger=None,
    params: Optional[dict] = None,
    start_epoch: int = 0,
    checkpoint_fn=None,
    save_every: int = 0,
    time_budget_s: float = 0.0,
    mesh=None,
) -> Tuple[dict, list]:
    """``time_budget_s`` > 0 stops gracefully (checkpoint saved by the
    caller as usual) once an epoch ends past the budget — unlike an
    external ``timeout`` kill, no work is lost. Sized so that remote-chip
    stalls or compile-time variance can't eat the final save."""
    def log(msg):
        if logger is not None:
            logger.print(msg)
        else:
            print(msg)

    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        params = model.init(key)
    if cfg.physics_normalize == "balanced" and cfg.physics_warmup < 1:
        # the balanced scale sg(ema_data/ema_phys) starts at its cold init
        # 1.0 and needs ~1/(1-beta) steps to converge; engaging physics
        # before that multiplies raw ~1e10 residuals into the loss and can
        # destroy a warm-started fit in the first few steps (measured:
        # warm wide384 + warmup 0 regressed u_r 7.7% -> 14.9%)
        log(
            "WARNING: physics_normalize='balanced' with physics_warmup=0 "
            "applies physics while the magnitude EMAs are still at their "
            "cold init — use physics_warmup >= 1 so they converge first"
        )
    if cfg.physics_normalize == "coupled" and "loss_bal" not in params:
        from ..models.si_gated import coupled_weighting_init

        params = {**params, "loss_bal": coupled_weighting_init()}
        log(f"coupled adaptive weighting on (trainable eps_data, "
            f"ratio {cfg.coupled_ratio}; modified_qpinn_cg.py:142-156)")
    optimizer, epoch_fn, n_batches = make_pretrain_epoch(
        model, X, Y, stats, cfg, mesh=mesh
    )
    opt_state = optimizer.init(params)
    ema = {k: jnp.asarray(1.0) for k in ("data",) + PHYS_KEYS + ("abs_data", "abs_phys")}

    history = []
    t0 = time.time()
    for epoch in range(start_epoch + 1, cfg.epochs + 1):
        ekey = jax.random.fold_in(key, epoch)
        params, opt_state, ema, metrics = epoch_fn(
            params, opt_state, ema, jnp.asarray(epoch, jnp.float32), ekey
        )
        m = jax.device_get(metrics)
        history.append(float(m["loss"]))
        if epoch == 1 or epoch % cfg.log_every == 0 or epoch == cfg.epochs:
            log(
                f"[PRETRAIN] epoch {epoch:04d}/{cfg.epochs} | "
                f"loss={m['loss']:.4e} | data={m['data']:.4e} | "
                f"phys={m['phys']:.4e} | phys_w={m['phys_w']:.3e} | "
                f"lr={m['lr']:.2e} | elapsed={time.time()-t0:.1f}s"
            )
        if checkpoint_fn is not None and save_every and epoch % save_every == 0:
            checkpoint_fn(_strip_balancer(params), epoch, history)
        if time_budget_s > 0 and time.time() - t0 > time_budget_s:
            log(
                f"[PRETRAIN] time budget {time_budget_s:.0f}s reached at "
                f"epoch {epoch}/{cfg.epochs} — stopping gracefully"
            )
            break
    return _strip_balancer(params), history


def _strip_balancer(params: dict) -> dict:
    """The coupled-weighting leaf is a training artifact, not a model
    weight — keep checkpoints loadable against the model's own template."""
    if "loss_bal" in params:
        return {k: v for k, v in params.items() if k != "loss_bal"}
    return params


def run_finetune(
    model: Hybrid16QPINN,
    params: dict,
    X: np.ndarray,
    Y: np.ndarray,
    stats: DataStats,
    cfg: CzConfig,
    logger=None,
) -> Tuple[dict, list]:
    """Shot-noise fine-tuning on the calibration subset (:544-613)."""
    del stats  # normalization already applied to X/Y

    def log(msg):
        if logger is not None:
            logger.print(msg)
        else:
            print(msg)

    x_c, y_c = choose_calibration_subset(X, Y, cfg.calib_size)
    xb = jnp.asarray(x_c)
    yb = jnp.asarray(y_c)

    noise = None
    if cfg.noise_depolarizing or cfg.noise_readout or cfg.noise_per_gate:
        from ..ops.measure import NoiseModel

        noise = NoiseModel(
            cfg.noise_depolarizing, cfg.noise_readout, cfg.noise_per_gate
        )

    q_apply = None
    if cfg.train_scope == "head":
        mask = Hybrid16QPINN.head_param_filter(params)
        detach_quantum = True
    elif cfg.train_scope == "full":
        # full scope genuinely trains the circuit: shot-sampled measurements
        # are re-evaluated at shifted parameters (the reference's
        # diff_method="parameter-shift" QNode, CG...16qubits.py:557-569) —
        # gradients reach the quantum weights AND flow through the inputs
        # into the classical trunk
        from .hardware_grad import make_hw_apply_cz

        mask = jax.tree_util.tree_map(lambda _: True, params)
        detach_quantum = False
        q_apply = make_hw_apply_cz(model.q, cfg.shots, noise=noise)
    else:
        raise ValueError(f"unsupported train_scope {cfg.train_scope!r}")

    # circuit-execution budget forecast (the reference prints this for
    # hardware runs, cg-hqpinn/...:711-718: SPSA's 2 evals vs param-shift's
    # 2P; here head scope = 1 eval/step, full scope = the shift-rule count)
    if cfg.train_scope == "full":
        from .hardware_grad import evals_per_step_cz

        per_step = evals_per_step_cz(model.q)
    else:
        per_step = 1
    log(
        f"[FINETUNE] circuit-execution budget: {cfg.finetune_epochs} epochs x "
        f"{per_step} evals/step x {cfg.calib_size} samples x "
        f"{cfg.shots or 'exact'} shots (scope={cfg.train_scope})"
    )

    optimizer = optax.adam(cfg.finetune_lr)
    opt_state = optimizer.init(params)

    fw = cfg.norm_field_weights()

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            pred = model.apply(
                p, xb, shots=cfg.shots, key=key, noise=noise,
                detach_quantum=detach_quantum, q_apply=q_apply,
            )
            sq = (pred - yb) ** 2
            return jnp.mean(sq if fw is None else sq * fw)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(
            lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    for epoch in range(1, cfg.finetune_epochs + 1):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, epoch))
        history.append(float(loss))
        if epoch == 1 or epoch % cfg.log_every == 0 or epoch == cfg.finetune_epochs:
            log(
                f"[FINETUNE] epoch {epoch:04d}/{cfg.finetune_epochs} | "
                f"data={history[-1]:.4e} | shots={cfg.shots} | scope={cfg.train_scope}"
            )
    return params, history
