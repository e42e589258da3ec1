"""Classical data-only capacity probe for the Czochralski fields.

Question this answers (PARITY.md flagship table): the 16q QCPINN's
velocity errors (u_r 12.6%, u_theta 16.6% rel-L2 on the real 18,108-node
COMSOL set) "look capacity-limited". Is the floor the *model* or the
*data*? This fits a purely classical net — the flagship's own trunk shape
(FourierFeatures + residual MLP + head, hard axis constraints, no circuit)
— by plain supervised MSE on the same normalized nodes and reports the
same field-wise rel-L2. CPU-feasible (no 2^n state), so it runs even when
the chip is busy: ~1-2 s/epoch at batch 256.

    PYTHONPATH=/root/repo python scripts/cz_classical_capacity.py \
        --data data/cz_melt_raw.txt --epochs 300 --width 128 --out /tmp/cap.json
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", default="data/cz_melt_raw.txt")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--depth", type=int, default=2,
                    help="number of residual blocks")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--physics-weight", type=float, default=0.0,
                    help="> 0 trains through the real pipeline "
                         "(run_pretrain, balanced normalization, cylindrical "
                         "residuals) instead of plain supervised MSE")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from qcpinn_tpu.data.cz_loader import load_cz_data
    from qcpinn_tpu.models import nn_core as nc
    from qcpinn_tpu.utils.evaluation import evaluate_cz_fields

    X, Y, stats = load_cz_data(args.data)
    print(f"loaded {len(X)} nodes")

    w = args.width

    def init(key):
        ks = jax.random.split(key, args.depth + 3)
        p = {
            "ff": nc.fourier_features_init(jax.random.PRNGKey(0), 2, 24, 6.0),
            "proj": nc.mlp_init(ks[0], (2 + 48, w, w)),
            "post": nc.mlp_init(ks[-1], (w, w, 64, 5)),
        }
        for d in range(args.depth):
            p[f"res{d}"] = nc.mlp_init(ks[1 + d], (w, w, w))
        return p

    def apply(p, x):
        h = jnp.concatenate([x, nc.fourier_features_apply(p["ff"], x)], axis=-1)
        h = jnp.tanh(nc.mlp_apply(p["proj"], h))
        for d in range(args.depth):
            h = jnp.tanh(h + nc.mlp_apply(p[f"res{d}"], h))
        raw = nc.mlp_apply(p["post"], h)
        r = x[:, 0:1]
        # same hard axis constraints as the flagship (czochralski.py)
        return jnp.concatenate(
            [r * raw[:, 0:1], raw[:, 1:2], r * raw[:, 2:3], raw[:, 3:4], raw[:, 4:5]],
            axis=1,
        )

    params = init(jax.random.PRNGKey(args.seed))
    print(f"classical capacity model: {nc.count_trainable(params)} trainable params "
          f"(flagship QCPINN: 125,973)")

    if args.physics_weight > 0:
        # physics-constrained variant: run the actual flagship pipeline
        # (balanced EMA weighting, cosine lr, cylindrical NS/energy
        # residuals) on the classical net — apply() is the only surface
        # run_pretrain needs
        from types import SimpleNamespace

        from qcpinn_tpu.train.cz_pipeline import CzConfig, run_pretrain

        cfg = CzConfig(
            n_qubits=4, n_layers=1, epochs=args.epochs,
            batch_size=args.batch_size, lr=args.lr,
            physics_weight=args.physics_weight, physics_warmup=25,
            physics_ramp=60, physics_normalize="balanced", log_every=25,
            seed=args.seed,
        )
        model = SimpleNamespace(apply=apply)
        params, _ = run_pretrain(model, X, Y, stats, cfg, params=params)
        metrics = evaluate_cz_fields(apply, params, X, Y)
        metrics["params"] = nc.count_trainable(params)
        metrics["epochs"] = args.epochs
        metrics["physics_weight"] = args.physics_weight
        print(json.dumps(metrics))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(metrics, f, indent=1)
        return 0
    # Plain-supervised branch. run_pretrain(physics_weight=0) now offers an
    # equivalent data-only mode; this loop is kept as-is because the
    # recorded capacity artifacts (artifacts/cz_*_capacity_*.json) were
    # produced by exactly this recipe — do not let the two drift: any
    # behavioral change belongs in cz_pipeline, with this probe rerun.
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.scale_by_adam(), optax.scale(-1.0)
    )
    opt_state = optimizer.init(params)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    nb = len(X) // args.batch_size

    @jax.jit
    def step(p, o, xb, yb, lr):
        loss, g = jax.value_and_grad(
            lambda pp: jnp.mean((apply(pp, xb) - yb) ** 2)
        )(p)
        up, o = optimizer.update(g, o, p)
        up = jax.tree_util.tree_map(lambda u: u * lr, up)
        return optax.apply_updates(p, up), o, loss

    @jax.jit
    def shuffle(key):
        perm = jax.random.permutation(key, len(Xd))[: nb * args.batch_size]
        return (Xd[perm].reshape(nb, args.batch_size, -1),
                Yd[perm].reshape(nb, args.batch_size, -1))

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    for e in range(1, args.epochs + 1):
        lr = jnp.float32(args.lr * 0.5 * (1 + np.cos(np.pi * e / args.epochs)))
        Xs, Ys = shuffle(jax.random.fold_in(key, e))
        losses = []
        for i in range(nb):
            params, opt_state, l = step(params, opt_state, Xs[i], Ys[i], lr)
            losses.append(l)
        if e == 1 or e % 25 == 0 or e == args.epochs:
            print(f"epoch {e:04d}/{args.epochs} | data={float(jnp.mean(jnp.stack(losses))):.4e} "
                  f"| {time.time()-t0:.0f}s", flush=True)

    metrics = evaluate_cz_fields(apply, params, X, Y)
    metrics["params"] = nc.count_trainable(params)
    metrics["epochs"] = args.epochs
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
