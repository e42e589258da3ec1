"""Micro-benchmark: are the block engine's state einsums at the HBM floor?

The round-5 decomposition (scripts/bench_probe.py) puts the whole 12q
streams step inside the evolve's forward+backward passes, with achieved
bandwidth ~13% of HBM peak. This script times the exact einsum shapes the
block engine issues (ops/block_fused.py:310-312) in isolation to separate
"the kernel is slow" from "the engine adds overhead".

Axon-platform caveat (measured here, round 5): `block_until_ready` does
NOT synchronize on the tunneled TPU — a bare timed einsum appears to run
at 26 TB/s and a calibration matmul at 10,900 TFLOP/s (55x over the
chip's bf16 peak). Every timing in this script therefore (a) chains the
op n times through a `lax.fori_loop` whose carry is the state (a
dependent chain XLA cannot hoist or elide), and (b) synchronizes by
`jax.device_get` of a scalar reduction — the same discipline bench.py and
scripts/mfu_ladder.py already use. scripts/bench_probe.py's full-step
rows were cross-checked against the device_get-synced bench.py (60.5 vs
58.5 ms) and stand; its sub-step rows are re-derived here.

Cases, at the bench shapes (12q streams: rows B*L = 7168, h = l = 64):

  hi     einsum('bkl,km->bml', s, U)  contraction on the MIDDLE dim
  lo     einsum('bkl,lm->bkm', s, U)  contraction on the MINOR dim
  flat   einsum('bk,km->bm',  s, U)   the ideal [B*L*h, l] x [l, l] matmul
  diag   s * exp(i phi)               the fused-diagonal segment
  chain  hi, lo, diag, hi, lo         the merged 12q cross_mesh evolve

Prints one JSON line per row: ms per op application and achieved GB/s
(traffic = read + write of the complex64 state; the [K,K] operand is
noise). Peak for v5e is ~819 GB/s.

Run on the TPU chip:  python scripts/einsum_floor.py --out artifacts/einsum_floor.json
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITERS = 30


def make_looped(step_fn, shape):
    """n dependent applications of step_fn via fori_loop, scalar output.

    The complex state is BUILT INSIDE the jit (lax.complex of on-device
    f32 normals) and the complex operands arrive as (real, imag) f32
    pairs: complex host->device transfer is unimplemented on axon, and a
    single failed transfer poisons every subsequent program in the
    process.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(key, *op_parts):
        ops = tuple(lax.complex(re, im) for re, im in
                    zip(op_parts[::2], op_parts[1::2]))
        k1, k2 = jax.random.split(key)
        s = lax.complex(jax.random.normal(k1, shape),
                        jax.random.normal(k2, shape))

        def body(_, carry):
            return step_fn(carry, *ops)

        out = lax.fori_loop(0, N_ITERS, body, s)
        return (jnp.sum(out.real) + jnp.sum(out.imag)).reshape(1)

    return jax.jit(run)


def timed(step_fn, shape, *ops_np, reps=3):
    """Median seconds per single application of step_fn.

    Subtracts the state-construction overhead measured by a 0-iteration
    variant? No: construction cost is amortized over N_ITERS dependent
    applications, <4% at N_ITERS=30.
    """
    import jax
    import numpy as np

    run = make_looped(step_fn, shape)
    parts = []
    for u in ops_np:
        parts += [jax.device_put(np.ascontiguousarray(u.real).astype(np.float32)),
                  jax.device_put(np.ascontiguousarray(u.imag).astype(np.float32))]
    key = jax.random.PRNGKey(0)
    float(jax.device_get(run(key, *parts))[0])  # compile + hard sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(run(key, *parts))[0])
        ts.append((time.perf_counter() - t0) / N_ITERS)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7168,
                    help="state rows (bench: B=1024 x 7 streams)")
    ap.add_argument("--hi", type=int, default=64)
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    import jax.numpy as jnp
    from jax import lax

    b, h, l = args.batch, args.hi, args.lo
    shape = (b, h, l)

    # near-unitary operands keep the iterated state finite (built on the
    # host: complex host->device transfer is unimplemented on axon, so
    # timed() ships them as f32 (real, imag) pairs)
    def haar(seed, k):
        rng = np.random.default_rng(seed)
        z = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
        q, _ = np.linalg.qr(z)
        return q.astype(np.complex64)

    uh, ul = haar(0, h), haar(1, l)
    eph = np.exp(1j * np.random.default_rng(2).normal(
        size=(h, l))).astype(np.complex64)
    bytes_state = 2 * (b * h * l) * 8  # read + write, complex64

    HI = lax.Precision.HIGHEST
    rows = []

    def rec(name, step, *ops, ops_per_step=1):
        sec = timed(step, shape, *ops) / ops_per_step
        ms = sec * 1e3
        gbs = bytes_state / sec / 1e9
        row = {"case": name, "ms_per_op": round(ms, 4),
               "gb_s": round(gbs, 1),
               "pct_hbm_peak": round(100 * gbs / 819.0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for prec, pname in ((HI, "highest"), (None, "default")):
        rec(f"hi_mid_contract/{pname}",
            functools.partial(
                lambda s, u, p: jnp.einsum("bkl,km->bml", s, u, precision=p),
                p=prec), uh)
        rec(f"lo_minor_contract/{pname}",
            functools.partial(
                lambda s, u, p: jnp.einsum("bkl,lm->bkm", s, u, precision=p),
                p=prec), ul)
        rec(f"flat_2d/{pname}",
            functools.partial(
                lambda s, u, p: (
                    jnp.einsum("bk,km->bm", s.reshape(-1, u.shape[0]), u,
                               precision=p).reshape(s.shape)),
                p=prec), ul)

    rec("diag_mul", lambda s, e: s * e[None], eph)

    def chain(s, uh, ul, e):
        s = jnp.einsum("bkl,km->bml", s, uh, precision=HI)
        s = jnp.einsum("bkl,lm->bkm", s, ul, precision=HI)
        s = s * e[None]
        s = jnp.einsum("bkl,km->bml", s, uh, precision=HI)
        s = jnp.einsum("bkl,lm->bkm", s, ul, precision=HI)
        return s

    rec("merged_chain_4mm_1diag/highest", chain, uh, ul, eph,
        ops_per_step=5)

    out = {"command": "scripts/einsum_floor.py",
           "batch": b, "hi": h, "lo": l, "n_iters": N_ITERS,
           "peak_hbm_gb_s": 819.0, "rows": rows,
           "note": ("dependent fori_loop chain + device_get sync; "
                    "block_until_ready does not synchronize on axon")}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
