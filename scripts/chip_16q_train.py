"""16q cross_mesh streams+Pallas train step on the real chip (VERDICT item 2)."""
import functools, time, sys
import jax, jax.numpy as jnp, optax

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.data import diffusion as dd
from qcpinn_tpu.models.dv_fourier import DVFourierSolver
from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
backend = sys.argv[3] if len(sys.argv) > 3 else "auto"

cfg = QCPINNConfig(
    num_qubits=n, num_quantum_layers=1, q_ansatz="cross_mesh",
    classic_network=(3, 50, 1), batch_size=batch, lr=5e-3, seed=42,
)
model = DVFourierSolver(cfg)
if backend != "xla":
    model.use_pallas(backend=backend)
print("backend:", type(model._fused).__name__ if model._fused else "xla")
params = model.init(jax.random.PRNGKey(0))
optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))
opt_state = optimizer.init(params)

box = dd._box
res_s = dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true)
bc_s = dd.Sampler(box([[0, 0, 0], [1, 0, 1]]), dd.u)
ic_s = dd.Sampler(box([[0, 0, 0], [0, 1, 1]]), dd.u)
third = max(batch // 3, 1)


def step(carry, key):
    params, opt_state = carry
    k1, k2, k3 = jax.random.split(key, 3)
    Xr, yr = res_s.sample(k1, batch)
    Xb, yb = bc_s.sample(k2, third)
    Xi, yi = ic_s.sample(k3, third)

    def loss_fn(p):
        _, r = dv_diffusion_residual_streams(model, p, Xr)
        return (
            2.0 * jnp.mean((r - yr) ** 2)
            + 4.0 * jnp.mean((model.apply(p, Xb) - yb) ** 2)
            + 2.0 * jnp.mean((model.apply(p, Xi) - yi) ** 2)
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return (optax.apply_updates(params, updates), opt_state), loss


@functools.partial(jax.jit, static_argnums=(3,))
def scan(params, opt_state, key, n_):
    keys = jax.random.split(key, n_)
    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, opt_state, losses


t0 = time.time()
n_steps = 10
key = jax.random.PRNGKey(1)
params, opt_state, losses = scan(params, opt_state, key, n_steps)
l0 = float(jax.device_get(losses)[-1])
print(f"compile+first {n_steps} steps: {time.time()-t0:.1f}s loss={l0:.3e}")
times = []
for trial in range(3):
    t0 = time.time()
    params, opt_state, losses = scan(params, opt_state, jax.random.fold_in(key, trial), n_steps)
    lf_ = float(jax.device_get(losses)[-1])
    times.append((time.time() - t0) / n_steps)
times.sort()
dt = times[len(times) // 2]
print(f"n={n} B={batch}: {dt*1000:.1f} ms/step  {batch/dt:.0f} pts/s  loss={lf_:.3e}")
