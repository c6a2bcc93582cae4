"""Device mesh + sharding rules.

The reference's entire distributed stack — mmcv init_dist, MMDataParallel /
MMDistributedDataParallel wrappers, DistributedGroupSampler, NCCL backend
config (utils/util_distribution.py, apis/train.py:151-163,
configs/yunet_n.py:18) — collapses to: one mesh, batch sharded over 'dp',
parameters replicated, collectives inserted by the compiler. The same jitted
program runs on 1 chip or a pod slice.

YuNet is a 76k-parameter convnet: data parallelism is the only axis that
pays (params fit in any core's VMEM; there is no sequence dimension). The
mesh is still built n-dimensional-ready — add axes here if a future model
family needs tensor/pipeline sharding.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def initialize_distributed() -> None:
    """Multi-host init (reads Slurm/JAX_* envs). Safe to skip single-host."""
    import jax

    jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp"):
    """Mesh over the first n (default all) devices; None if single device."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh, axis: str = "dp"):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh, axis: str = "dp") -> Dict:
    """Place a host batch onto the mesh, batch-dim sharded."""
    import jax

    sh = batch_sharding(mesh, axis)
    if sh is None:
        return jax.device_put(batch)
    return jax.device_put(batch, sh)
