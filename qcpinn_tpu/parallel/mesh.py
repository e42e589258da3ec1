"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md §2.2); here the
collocation batch is a first-class sharded axis. Design:

- mesh axes: ('data', 'amp'). 'data' shards the collocation batch (the
  primary scaling axis for PINN training); 'amp' shards the 2^n statevector
  amplitude axis for high qubit counts (see parallel/sharded_sv.py).
- params are replicated; XLA inserts the gradient psum over 'data'
  automatically from the sharding constraints in train/loop.py.
- collectives ride ICI: a single jitted train step, no per-step host sync.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    amp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'amp') mesh. Defaults to all devices on the data
    axis (pure batch parallelism)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // amp
    if data * amp != n:
        raise ValueError(f"data({data}) * amp({amp}) != device count ({n})")
    arr = np.asarray(devices).reshape(data, amp)
    return Mesh(arr, ("data", "amp"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array sharded over its leading (batch) dimension."""
    spec = [None] * x.ndim
    spec[0] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))
