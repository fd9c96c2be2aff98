"""Device mesh + sharding helpers — the distributed backbone.

The reference's entire distributed story is single-process `nn.DataParallel`
(`DS_NeRF/run.py:43-46, 1491-1527`: replicate module, scatter batch, gather).
TPU-native replacement: a 1-D `Mesh('data')` over all chips; params replicated,
ray batches sharded on the leading axis; XLA emits `psum` over ICI for the gradient
all-reduce inside the single jitted step. Multi-host scale-out (DCN across slices)
uses the same program after `jax.distributed.initialize`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} device(s) "
            "are available"
        )
    return Mesh(np.asarray(devices[:n]).reshape(n), (axis,))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh.

    Multi-process meshes can't be fed by `device_put` (it rejects shardings
    spanning non-addressable devices); every process passes its identical
    full copy through `make_array_from_process_local_data` instead."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def shard_leading(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dim over the mesh axis. In multi-process
    runs each process passes ITS OWN contiguous slice of the global batch
    (process p owns rows [p*L, (p+1)*L) of a num_processes*L global array)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host (DCN) init — no-op in single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def round_up_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
