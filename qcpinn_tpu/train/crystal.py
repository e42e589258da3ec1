"""Phase-field crystal-growth training — the reference's SPSA session loop
(hybrid_qpinn_2dcrystal_ibmtest.py:300-335) assembled around
:class:`models.crystal.CrystalPINN`:

- every SPSA loss evaluation draws a FRESH adaptive interface sample set
  (the reference's ``loss_fn = lambda: crystal_growth_loss(model,
  adaptive_sampling(model))`` closure re-samples per call, :327-330) —
  reproduced by threading the evaluation's PRNG key into the sampler;
- SPSA gains are the reference's CONSTANT lr/delta (:271-294 has no decay),
  i.e. SPSAConfig(alpha=0, gamma=0);
- mode 'spsa' perturbs ONLY the quantum weights (the reference hands
  ``[model.q.weights]`` to its optimizer, :316-320; classical stays frozen);
  mode 'spsa-split' adds simultaneous Adam steps on the classical partition
  (the cg-hqpinn recipe, ...16q_effective.py:727-748);
- an optional classical warmup stage pre-trains the classical partition
  with Adam while the quantum weights are frozen — the staged recipe of
  test_hqpinn_cg.py:180-199 (``train_classical_only``).

The whole step (adaptive sampling -> second-order crystal loss -> SPSA
update) is one jitted ``lax.scan`` body; the host is touched only at
logging boundaries.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..physics.phase_field import adaptive_interface_sampling, crystal_growth_loss
from .spsa import SPSAConfig, spsa_split_step, spsa_step


@dataclasses.dataclass
class CrystalConfig:
    n_qubits: int = 4
    n_layers: int = 3
    # reference constants (hybrid_qpinn_2dcrystal_ibmtest.py:57-63)
    spsa_steps: int = 50
    spsa_lr: float = 0.02
    spsa_delta: float = 0.01
    n_bulk: int = 32
    n_interface: int = 64
    # staged classical pretrain (test_hqpinn_cg.py:180-199); 0 = skip
    warmup_epochs: int = 0
    warmup_lr: float = 1e-3
    mode: str = "spsa"  # spsa (quantum-only) | spsa-split (quantum SPSA + classical Adam)
    seed: int = 0
    log_every: int = 5

    def __post_init__(self):
        if self.mode not in ("spsa", "spsa-split"):
            raise ValueError(f"unknown crystal mode {self.mode!r}")


def make_crystal_loss(model, cfg: CrystalConfig):
    """``loss_fn(params, key) -> scalar``: adaptive sampling + crystal loss.

    The forward is the exact simulator — the crystal loss is built from
    input derivatives of the model (phi_x, lap phi), which a shot-sampled
    readout cannot provide (the reference's hardware script has the same
    structural constraint); SPSA remains the hardware-fidelity *update*
    rule on top of it."""

    def loss_fn(params, key):
        apply_b = lambda X: model.apply(params, X)
        x = adaptive_interface_sampling(
            apply_b, key, n_bulk=cfg.n_bulk, n_interface=cfg.n_interface
        )
        return crystal_growth_loss(apply_b, x)

    return loss_fn


def train_crystal(
    model,
    cfg: CrystalConfig,
    logger=None,
    params: Optional[dict] = None,
) -> Tuple[dict, dict]:
    """Run (optional warmup ->) SPSA training. Returns
    ``(params, {"warmup_history": [...], "spsa_history": [...]})``."""

    def log(msg):
        if logger is not None:
            logger.print(msg)

    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_warm, k_train = jax.random.split(key, 3)
    if params is None:
        params = model.init(k_init)
    loss_fn = make_crystal_loss(model, cfg)
    quantum_keys = tuple(getattr(model, "quantum_param_keys", ("q",)))

    warmup_history = []
    if cfg.warmup_epochs > 0:
        # classical-only Adam stage, quantum frozen (test_hqpinn_cg.py:180-199)
        warm_opt = optax.adam(cfg.warmup_lr)

        def c_loss(c_part, q_part, kk):
            full = dict(c_part)
            full.update(q_part)
            return loss_fn(full, kk)

        @functools.partial(jax.jit, static_argnums=(3,))
        def warm_scan(params, opt_state, base_key, n):
            q_part = {k: params[k] for k in quantum_keys}
            c_part = {k: v for k, v in params.items() if k not in quantum_keys}
            frozen_q = jax.tree_util.tree_map(jax.lax.stop_gradient, q_part)

            def body(carry, i):
                c, s = carry
                kk = jax.random.fold_in(base_key, i)
                loss, g = jax.value_and_grad(c_loss)(c, frozen_q, kk)
                upd, s = warm_opt.update(g, s, c)
                return (optax.apply_updates(c, upd), s), loss

            (c_part, opt_state), losses = jax.lax.scan(
                body, (c_part, opt_state), jnp.arange(n)
            )
            out = dict(c_part)
            out.update(q_part)
            return out, opt_state, losses

        c0 = {k: v for k, v in params.items() if k not in quantum_keys}
        warm_state = warm_opt.init(c0)
        t0 = time.time()
        params, warm_state, losses = warm_scan(
            params, warm_state, k_warm, cfg.warmup_epochs
        )
        warmup_history = [float(v) for v in jax.device_get(losses)]
        log(
            f"classical warmup: {cfg.warmup_epochs} Adam epochs, "
            f"loss {warmup_history[0]:.4e} -> {warmup_history[-1]:.4e} "
            f"({time.time() - t0:.1f}s)"
        )

    spsa_cfg = SPSAConfig(a=cfg.spsa_lr, c=cfg.spsa_delta, alpha=0.0, gamma=0.0)
    split = cfg.mode == "spsa-split"
    adam = optax.adam(cfg.warmup_lr) if split else None

    if split:
        c0 = {k: v for k, v in params.items() if k not in quantum_keys}
        opt_state = adam.init(c0)

        @functools.partial(jax.jit, static_argnums=(3,))
        def spsa_scan(params, opt_state, base_key, n):
            def body(carry, i):
                p, s = carry
                kk = jax.random.fold_in(base_key, i)
                p, s, loss = spsa_split_step(
                    loss_fn, p, i.astype(jnp.float32) + 1.0, kk, spsa_cfg,
                    adam, s, quantum_keys=quantum_keys,
                )
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n)
            )
            return params, opt_state, losses
    else:
        opt_state = None

        @functools.partial(jax.jit, static_argnums=(3,))
        def spsa_scan(params, opt_state, base_key, n):
            def body(carry, i):
                p, _ = carry
                kk = jax.random.fold_in(base_key, i)
                q_part = {k: p[k] for k in quantum_keys}

                def q_loss(q, kq):
                    full = dict(p)
                    full.update(q)
                    return loss_fn(full, kq)

                new_q, loss = spsa_step(
                    q_loss, q_part, i.astype(jnp.float32) + 1.0, kk, spsa_cfg
                )
                p = dict(p)
                p.update(new_q)
                return (p, None), loss

            (params, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n)
            )
            return params, None, losses

    chunk = max(1, min(cfg.log_every, cfg.spsa_steps))
    history = []
    done = 0
    t0 = time.time()
    while done < cfg.spsa_steps:
        n = min(chunk, cfg.spsa_steps - done)
        k_chunk = jax.random.fold_in(k_train, done)
        params, opt_state, losses = spsa_scan(params, opt_state, k_chunk, n)
        history.extend(float(v) for v in jax.device_get(losses))
        done += n
        log(
            f"[SPSA{'-split' if split else ''}] step {done}/{cfg.spsa_steps} "
            f"| crystal loss: {history[-1]:.4e} | {time.time() - t0:.1f}s"
        )
    return params, {"warmup_history": warmup_history, "spsa_history": history}
