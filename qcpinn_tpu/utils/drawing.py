"""Circuit drawing (the reference saves a circuit.pdf via qml.draw_mpl,
nn/DVPDESolver.py:144-158): a text diagram of the gate program plus an
optional matplotlib rendering of the same, saved into the run directory."""

from __future__ import annotations

import os
from typing import List, Optional

from ..ops.circuit import DVCircuit
from ..ops.diag_fusion import DiagRun
from ..ops.program import Op


def _op_label(op) -> str:
    if isinstance(op, DiagRun):
        kinds = []
        if len(op.pidx):
            kinds.append(f"{len(op.pidx)}θ")
        if op.quad:
            kinds.append(f"{len(op.quad)}×CRZ/CZ-quad")
        if op.const_pairs:
            kinds.append(f"{len(op.const_pairs)}×CZ")
        return f"DiagRun({', '.join(kinds)})"
    if op.pidx:
        return f"{op.kind.upper()}(θ{list(op.pidx)})"
    return op.kind.upper()


def circuit_text(circuit: DVCircuit, fused: bool = False) -> str:
    """Wire-per-line ASCII diagram of one ansatz layer (+ epilogue)."""
    program = (circuit.program if fused else circuit.program_raw) + circuit.epilogue
    n = circuit.n
    lines: List[List[str]] = [[f"q{w:>2}:"] for w in range(n)]
    for op in program:
        width = 0
        cells = [""] * n
        if isinstance(op, DiagRun):
            lab = "[D]"
            for w in range(n):
                cells[w] = lab
        else:
            if op.kind in ("cnot", "cz", "crx", "cry", "crz", "u2q", "swap"):
                a, b = op.wires
                ctrl_mark = "●" if op.kind != "u2q" else "U"
                tgt = {"cnot": "⊕", "cz": "Z", "crx": "RX", "cry": "RY",
                       "crz": "RZ", "u2q": "U", "swap": "x"}[op.kind]
                cells[a] = ctrl_mark
                cells[b] = tgt
                lo, hi = min(a, b), max(a, b)
                for w in range(lo + 1, hi):
                    cells[w] = "│"
            else:
                w = op.wires[0]
                name = {"rx": "RX", "ry": "RY", "rz": "RZ", "rot": "R3",
                        "ps": "P", "h": "H", "x": "X", "y": "Y", "z": "Z",
                        "u1q": "U"}[op.kind]
                cells[w] = name
        width = max((len(c) for c in cells), default=1)
        for w in range(n):
            pad = cells[w] if cells[w] else "─" * width
            lines[w].append(f"─{pad:─^{width}}─")
    return "\n".join("".join(row) for row in lines)


def draw_circuit(
    circuit: DVCircuit, out_dir: Optional[str] = None, name: str = "circuit"
) -> str:
    """Write circuit.txt (+ circuit.pdf if matplotlib is available).
    Returns the text diagram."""
    text = circuit_text(circuit)
    header = (
        f"ansatz={circuit.ansatz} n={circuit.n} layers={circuit.layers} "
        f"params/layer={circuit.params_per_layer} encoding={circuit.encoding}\n"
        f"(one layer shown; encoding RX/amplitude prep precedes it)\n\n"
    )
    if out_dir is not None:
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(header + text + "\n")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(
                figsize=(min(2 + 0.25 * len(circuit.program_raw), 40), 1 + 0.4 * circuit.n)
            )
            ax.axis("off")
            ax.text(0, 1, header + text, family="monospace", fontsize=7,
                    va="top", transform=ax.transAxes)
            fig.savefig(os.path.join(out_dir, f"{name}.pdf"), bbox_inches="tight")
            plt.close(fig)
        except Exception:
            pass
    return header + text


def cv_circuit_text(layer) -> str:
    """Text diagram of a CVLayer program (the reference draws its CV QNode
    via qml.draw_mpl in nn/CVPDESolver.py:139-152; here the program is
    static, so the diagram is built from the wiring directly)."""
    m = layer.m
    lines = [
        f"CV circuit: variant {layer.variant}, {m} qumodes, "
        f"{layer.layers} layers, cutoff {layer.d}",
        "",
        "encoding: "
        + (
            "Displacement(s_i * x_i, phi_i) per mode (learnable)"
            if layer.variant == 3
            else "Displacement(x_i, 0) per mode"
        ),
    ]
    bs = " ".join(f"BS(q{a},q{b})" for _, (a, b) in layer.placements) or "—"
    rot = " ".join(f"R(q{i})" for i in range(max(1, m - 1)))
    for l in range(layer.layers):
        lines.append(f"layer {l}:")
        lines.append(f"  U1: {bs} | {rot}")
        lines.append("  S(r,phi) on every mode")
        lines.append(f"  U2: {bs} | {rot}")
        extra = " CubicPhase" if layer.variant == 3 else ""
        lines.append(f"  D(r,phi) + Kerr{extra} on every mode")
        if layer.variant == 3:
            pairs = " ".join(
                f"CK(q{i},q{j})" for i in range(m) for j in range(i + 1, m)
            )
            lines.append(f"  CrossKerr: {pairs}")
    lines.append(
        "readout: " + ("<x_i>" if layer.variant == 2 else "<n_i>") + " per mode"
    )
    return "\n".join(lines)


def draw_cv_circuit(layer, out_dir: Optional[str] = None, name: str = "circuit") -> str:
    """Write circuit.txt (+ circuit.pdf) for a CV solver's quantum layer —
    parity with CVPDESolver.draw_quantum_circuit (nn/CVPDESolver.py:139-152)."""
    text = cv_circuit_text(layer)
    if out_dir is not None:
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text + "\n")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(10, 1 + 0.3 * len(text.splitlines())))
            ax.axis("off")
            ax.text(0, 1, text, family="monospace", fontsize=8, va="top",
                    transform=ax.transAxes)
            fig.savefig(os.path.join(out_dir, f"{name}.pdf"), bbox_inches="tight")
            plt.close(fig)
        except Exception:
            pass
    return text
