"""One-off baseline measurement: reference-equivalent training throughput on
CPU with PyTorch.

The reference (PennyLane default.qubit + torch, CPU) publishes no numbers, so
we measure a *conservative stand-in*: the same 12-qubit cross_mesh DV-solver
training step (sample -> sandwich forward -> convection-diffusion residual
via nested autograd -> weighted loss -> backward -> Adam) implemented with a
raw torch complex-einsum statevector simulator. Raw torch is strictly faster
than the reference's PennyLane QNode path (no tape construction / framework
dispatch per gate), so points/sec measured here is an UPPER bound on the
reference's CPU throughput — using it as the bench denominator understates
our speedup.

Run manually; the result is recorded in bench.py (BASELINE_PTS_PER_SEC).
"""

import math
import time

import torch

torch.manual_seed(0)

N = 12
BATCH = 256
DIM = 1 << N


def apply_1q(state, wire, m):
    b = state.shape[0]
    lo, hi = 1 << wire, 1 << (N - 1 - wire)
    s = state.reshape(b, lo, 2, hi)
    a0, a1 = s[:, :, 0, :], s[:, :, 1, :]
    b0 = m[0, 0] * a0 + m[0, 1] * a1
    b1 = m[1, 0] * a0 + m[1, 1] * a1
    return torch.stack([b0, b1], dim=2).reshape(b, DIM)


def apply_1q_batched(state, wire, m):  # m: [B,2,2]
    b = state.shape[0]
    lo, hi = 1 << wire, 1 << (N - 1 - wire)
    s = state.reshape(b, lo, 2, hi)
    a0, a1 = s[:, :, 0, :], s[:, :, 1, :]
    m = m[:, :, :, None, None]
    b0 = m[:, 0, 0] * a0 + m[:, 0, 1] * a1
    b1 = m[:, 1, 0] * a0 + m[:, 1, 1] * a1
    return torch.stack([b0, b1], dim=2).reshape(b, DIM)


def apply_2q(state, wa, wb, u4):
    w1, w2 = min(wa, wb), max(wa, wb)
    if wa > wb:
        u4 = u4.reshape(2, 2, 2, 2).permute(1, 0, 3, 2).reshape(4, 4)
    b = state.shape[0]
    da, dm, dc = 1 << w1, 1 << (w2 - w1 - 1), 1 << (N - 1 - w2)
    s = state.reshape(b, da, 2, dm, 2, dc)
    u = u4.reshape(2, 2, 2, 2)
    return torch.einsum("klij,baicjd->bakcld", u, s).reshape(b, DIM)


def rx(t):
    c, s = torch.cos(t / 2), torch.sin(t / 2)
    return torch.stack(
        [torch.stack([c, -1j * s], -1), torch.stack([-1j * s, c], -1)], -2
    )


def rz_phase(t, bit):  # diagonal phases handled explicitly like PennyLane
    return torch.where(bit > 0, torch.exp(1j * t / 2), torch.exp(-1j * t / 2))


BITS = ((torch.arange(DIM)[:, None] >> (N - 1 - torch.arange(N))[None, :]) & 1).to(
    torch.float32
)
SIGNS = 1.0 - 2.0 * BITS


def circuit(params, x):
    """cross_mesh, 1 layer: encode RX(x) -> RX, RZ, all-to-all CRZ, RX, RZ."""
    b = x.shape[0]
    state = torch.zeros(b, DIM, dtype=torch.complex64)
    state[:, 0] = 1.0
    for w in range(N):
        state = apply_1q_batched(state, w, rx(x[:, w].to(torch.complex64).real))
    p = 0
    for w in range(N):
        state = apply_1q(state, w, rx(params[p]))
        p += 1
    # rz layer as phases
    phases = torch.zeros(b, DIM, dtype=torch.complex64)
    for w in range(N):
        t = params[p]
        p += 1
        phases = phases + 1j * (t * BITS[:, w] - t / 2)
    # crz all-to-all
    for i in range(N - 1, -1, -1):
        for j in range(N - 1, -1, -1):
            if j != i:
                t = params[p]
                p += 1
                phases = phases + 1j * (t * BITS[:, i] * BITS[:, j] - t / 2 * BITS[:, i])
    state = state * torch.exp(phases)
    for w in range(N):
        state = apply_1q(state, w, rx(params[p]))
        p += 1
    for w in range(N):
        t = params[p]
        p += 1
        state = state * torch.exp(1j * (t * BITS[:, w] - t / 2))
    probs = (state.conj() * state).real
    return probs @ SIGNS


class Solver(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.pre = torch.nn.Sequential(
            torch.nn.Linear(3, 50), torch.nn.Tanh(), torch.nn.Linear(50, N)
        )
        self.qp = torch.nn.Parameter(0.1 * torch.randn(4 * N + N * (N - 1)))
        self.post = torch.nn.Sequential(
            torch.nn.Linear(N, 50), torch.nn.Tanh(), torch.nn.Linear(50, 1)
        )

    def forward(self, x):
        return self.post(circuit(self.qp, self.pre(x)))


def main():
    model = Solver()
    opt = torch.optim.Adam(model.parameters(), lr=5e-3)

    def step():
        opt.zero_grad()
        X_res = torch.rand(BATCH, 3, requires_grad=False)
        t, x, y = [X_res[:, i : i + 1].clone().requires_grad_(True) for i in range(3)]
        u = model(torch.cat([t, x, y], 1))
        ones = torch.ones_like(u)
        u_t = torch.autograd.grad(u, t, ones, create_graph=True)[0]
        u_x = torch.autograd.grad(u, x, ones, create_graph=True)[0]
        u_y = torch.autograd.grad(u, y, ones, create_graph=True)[0]
        u_xx = torch.autograd.grad(u_x, x, torch.ones_like(u_x), create_graph=True)[0]
        u_yy = torch.autograd.grad(u_y, y, torch.ones_like(u_y), create_graph=True)[0]
        res = u_t + u_x + u_y - 0.01 * (u_xx + u_yy)
        X_bc = torch.rand(BATCH // 3, 3)
        X_ic = torch.rand(BATCH // 3, 3)
        loss = (
            2.0 * (res**2).mean()
            + 4.0 * (model(X_bc) ** 2).mean()
            + 2.0 * (model(X_ic) ** 2).mean()
        )
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = (time.time() - t0) / iters
    total_pts = BATCH + 2 * (BATCH // 3)
    print(f"torch-CPU 12q cross_mesh train step: {dt*1e3:.0f} ms/step")
    print(f"residual-points/sec: {BATCH/dt:,.1f}")
    print(f"total-points/sec:    {total_pts/dt:,.1f}")


if __name__ == "__main__":
    main()
