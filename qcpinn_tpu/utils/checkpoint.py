"""Checkpoint bundles: {params, opt_state, sched, loss_history, stats,
config, epoch} — capability parity with the reference's three formats
(SURVEY.md §5.4): solver state bundles (nn/DVPDESolver.py:116-143),
trainer epoch checkpoints (train_hybrid_qpinn.py:747-754), and pipeline
checkpoints with normalization stats that are load-bearing for the
two-phase aer->finetune handoff (CG_HQPINN_IBMtest_16qubits.py:443-464).

Format: a single .npz with flattened pytree leaves + a JSON manifest of the
tree structure and metadata. Dependency-free, host-portable, and the stats
sidecar is human-readable like the reference's `.stats.json`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(l) for l in leaves], treedef


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    sched=None,
    loss_history=None,
    stats: Optional[dict] = None,
    config: Optional[dict] = None,
    epoch: int = 0,
) -> str:
    """Write `<path>.npz` + `<path>.json` (+ `<path>.stats.json` if stats)."""
    bundle = {
        "params": params,
        "opt_state": opt_state,
        "sched": sched,
    }
    leaves, treedef = _flatten(bundle)
    arrays = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    np.savez(path + ".npz", **arrays)

    manifest = {
        "treedef": str(treedef),
        "num_leaves": len(leaves),
        "epoch": int(epoch),
        "loss_history": [float(v) for v in (loss_history or [])],
        "stats": stats,
        "config": config,
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    if stats is not None:
        with open(path + ".stats.json", "w") as f:
            json.dump(stats, f, indent=2, default=str)
    return path + ".npz"


def load_checkpoint(path: str, like) -> dict:
    """Restore a bundle. ``like`` is a template pytree with the same
    structure as what was saved (e.g. freshly-initialized
    {"params":..., "opt_state":..., "sched":...}); leaves are replaced by the
    stored arrays. Returns {"bundle", "epoch", "loss_history", "stats",
    "config"}."""
    data = np.load(path + ".npz", allow_pickle=False)
    with open(path + ".json") as f:
        manifest = json.load(f)
    n = manifest["num_leaves"]
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    template_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(template_leaves) != n:
        raise ValueError(
            f"template has {len(template_leaves)} leaves, checkpoint has {n}"
        )
    bundle = jax.tree_util.tree_unflatten(treedef, leaves)
    return {
        "bundle": bundle,
        "epoch": manifest["epoch"],
        "loss_history": manifest["loss_history"],
        "stats": manifest["stats"],
        "config": manifest["config"],
    }


def save_params_only(path: str, params) -> str:
    """Bare state-dict analogue (train_hybrid_qpinn.py:759)."""
    return save_checkpoint(path, params)


def exists(path: str) -> bool:
    return os.path.exists(path + ".npz") and os.path.exists(path + ".json")
