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
    """Place each array with its leading (batch) dim sharded over `axis`.

    Single-process: a plain ``device_put`` scatters the host array over the
    local devices.  Multi-process: each host holds only *its* rows of the
    global batch (``CaptionLoader(host_id, host_count)`` striding), so the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — every host contributes its
    shard and the global batch is the concatenation over processes.  The
    local batch must already be padded to a multiple of the host's local
    device count (``pad_to_multiple(batch, mesh.local_mesh.size)``)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh.

    Multi-process: ``device_put`` of a host-local value against a global
    sharding is not allowed, so each leaf is assembled with
    ``make_array_from_callback`` — every host supplies its (identical,
    same-seed) full copy for its addressable devices."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def rep(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return jax.tree.map(rep, tree)


def coordination_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Barrier over the jax coordination service (NOT a device collective).

    Gloo's cross-process rendezvous for CPU collectives has a fixed ~30 s
    timeout, so if one host finishes compiling a step much later than
    another (e.g. a shared on-disk compilation cache turns one host's
    compile into a hit and the other's into a miss), the first host times
    out waiting inside the collective.  Compiling ahead-of-time and passing
    this barrier before *executing* keeps all hosts' collective entry
    within milliseconds.  No-op when the distributed runtime is not up."""
    from jax._src import distributed
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def pad_to_multiple(batch: Dict[str, Any], m: int) -> Dict[str, Any]:
    """Pad every array's leading (batch) dim to a multiple of ``m`` by
    repeating the first rows — the reference's
    ``CaptionDistributedSampler`` pad-to-divisible trick
    (datasets/caption_dataset.py:262-275).  Numpy inputs stay numpy (the
    multi-process path feeds host arrays straight into
    ``make_array_from_process_local_data``; no device round-trip)."""
    import jax.numpy as jnp
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % m
    if pad == 0:
        return batch
    # tile first: pad can exceed n (e.g. 3 rows on an 8-device mesh needs 5)
    reps = -(-pad // n)

    def _pad(v):
        xp = np if isinstance(v, np.ndarray) else jnp
        return xp.concatenate([v] + [v] * reps, axis=0)[: n + pad]

    return {k: _pad(v) for k, v in batch.items()}
