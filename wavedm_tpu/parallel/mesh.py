"""Device mesh construction and sharding rules.

Replaces the reference's NCCL DDP stack (process groups at
train_diffusion.py:80, DDP wrap at models/ddm_wavelet.py:168,
DistributedSampler at datasets/raindrop.py:39-40) with a named
`jax.sharding.Mesh`:

- axis "data": data parallelism.  The per-step patch batch is sharded along
  its leading axis; gradients are averaged by XLA-inserted collectives over
  ICI (the allreduce the reference gets implicitly from DDP backward).
- FSDP option: parameters/optimizer state/EMA are additionally sharded along
  "data" on each tensor's largest divisible axis and all-gathered on use —
  the ZeRO-3-style sharding the reference lacks entirely (SURVEY.md section 2:
  "TP/PP/SP/EP: not present").

Single-process multi-host would extend the same mesh over
``jax.distributed.initialize``; rank-0-style gating becomes
``jax.process_index() == 0``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (-1 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, n_shards: int) -> P:
    """Shard the largest axis divisible by n_shards; replicate otherwise."""
    if not shape:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings: each tensor sharded over the data axis on
    its largest divisible dim (ZeRO-3 style)."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, _fsdp_spec(np.shape(p), n)), params)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with leading-axis sharding (plain transfer on
    a 1-device mesh).

    Multi-host: each process passes its LOCAL batch (the per-process slice
    produced by the index-striped datasets) and the global array is
    assembled across processes -- the DDP semantics of the reference's
    per-rank DataLoader (datasets/raindrop.py:39-40); global batch size =
    local batch * process_count."""
    if mesh.size == 1:
        return jax.tree_util.tree_map(jax.device_put, batch)
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
