"""Device mesh + sharding helpers — the TPU-native replacement for DDP.

The reference's only parallelism is NCCL data-parallel DDP
(``runners/pytorch_runner_vae.py:155-161,204-207``; SURVEY §2.9).  Here data
parallelism is expressed with a 1-D ``jax.sharding.Mesh`` over the ``data``
axis: batches are sharded over it, parameters are replicated, and the gradient
all-reduce is inserted by XLA when the sharded loss is averaged — riding ICI
collectives instead of NCCL.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``CaptionLoader(host_id=jax.process_index(), host_count=jax.process_count())``
shards the input pipeline per host (the reference's unfinished
``CaptionDistributedSampler``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place each array with its leading (batch) dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def pad_to_multiple(batch: Dict[str, Any], m: int) -> Dict[str, Any]:
    """Pad every array's leading (batch) dim to a multiple of ``m`` by
    repeating the first rows — the reference's
    ``CaptionDistributedSampler`` pad-to-divisible trick
    (datasets/caption_dataset.py:262-275)."""
    import jax.numpy as jnp
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % m
    if pad == 0:
        return batch
    # tile first: pad can exceed n (e.g. 3 rows on an 8-device mesh needs 5)
    reps = -(-pad // n)
    return {k: jnp.concatenate([v] + [v] * reps, axis=0)[: n + pad]
            for k, v in batch.items()}
