"""Device mesh + sharding helpers — the TPU-native replacement for DDP.

The reference's only parallelism is NCCL data-parallel DDP
(``runners/pytorch_runner_vae.py:155-161,204-207``; SURVEY §2.9).  Here data
parallelism is expressed with a 1-D ``jax.sharding.Mesh`` over the ``data``
axis: batches are sharded over it, parameters are replicated, and the gradient
all-reduce is inserted by XLA when the sharded loss is averaged — riding ICI
collectives instead of NCCL.

Beyond the reference: ``model_parallel: M`` (config) builds a 2-D
``(data, model)`` mesh and splits the vocab-sized parameters — embedding
tables ``[V, E]`` and the classifier head ``[E, V]``, the dominant weights
once vocabularies grow — over the ``model`` axis (:func:`shard_by_vocab`).
``sequence_parallel: true`` additionally shards mel time over the same
axis on ingest (:func:`shard_batch` ``seq_axis``), spatially partitioning
the encoder convs so long-clip activations split across chips.  No
model-code changes for either: the SPMD partitioner propagates the
annotations and inserts the collectives (column-parallel classifier
matmul, psum'd log-softmax, all-gathered embedding lookups, conv halo
exchanges).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``CaptionLoader(host_id=jax.process_index(), host_count=jax.process_count())``
shards the input pipeline per host (the reference's unfinished
``CaptionDistributedSampler``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(model_parallel: int, n_devices: Optional[int] = None) -> Mesh:
    """2-D ``(data, model)`` mesh: batches shard over ``data``, vocab-sized
    parameters over ``model`` (see :func:`shard_by_vocab`).  The model axis
    should map to the fastest interconnect ring — jax device order already
    enumerates ICI neighbours adjacently, so consecutive devices share the
    ``model`` axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} does not divide "
                         f"{n} devices")
    if jax.process_count() > 1 and jax.local_device_count() % model_parallel:
        # jax.devices() enumerates each process's devices contiguously, so
        # the model axis stays host-local only when mp divides the local
        # count.  A model axis spanning hosts would declare P("data")
        # batches "replicated over model" across hosts whose loaders hold
        # DIFFERENT rows — silently wrong collectives, so refuse.
        raise ValueError(
            f"model_parallel={model_parallel} must divide the per-host "
            f"device count ({jax.local_device_count()}) so the model axis "
            f"stays within one host's devices")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def vocab_pspec(leaf, vocab_size: int, axis: str = "model") -> P:
    """PartitionSpec for one array under vocab tensor-parallelism.

    Shape-based rule: a leading dim equal to the vocabulary size (embedding
    tables ``[V, E]``, classifier bias ``[V]``) shards over ``axis``; a
    trailing dim equal to it (classifier kernels ``[E, V]``) shards the last
    dim; anything else is replicated.  Shape-based so it applies uniformly to
    params AND their optimizer-state mirrors (Adam mu/nu) with no knowledge
    of the optax chain's structure.  Callers must ensure no non-vocab dim
    collides with ``vocab_size`` (real vocabs are ~5k — far from any channel
    or time dim; tests pick distinct sizes)."""
    shape = tuple(getattr(leaf, "shape", ()) or ())
    if len(shape) >= 1 and shape[0] == vocab_size:
        return P(axis, *([None] * (len(shape) - 1)))
    if len(shape) >= 2 and shape[-1] == vocab_size:
        return P(*([None] * (len(shape) - 1)), axis)
    return P()


def check_vocab_divisible(vocab_size: int, model_parallel: int) -> bool:
    """Explicit array placement (unlike SPMD intermediates) requires the
    sharded dim to divide the axis extent.  Returns False (caller should
    fall back to replication and warn) when it doesn't — the fix is
    ``build_vocab --pad_to_multiple=M``, which pads the *vocabulary* with
    inert ``<pad_k>`` tokens the way production tokenizers are padded for
    TP (see that docstring for the exact semantics of the pads)."""
    return vocab_size % model_parallel == 0


def shard_by_vocab(tree: Any, mesh: Mesh, vocab_size: int):
    """Tensor-parallel placement of a state pytree on a ``(data, model)``
    mesh: vocab-dim leaves split over ``model`` (the decoder classifier's
    ``[E, V]`` matmul runs column-parallel; XLA's SPMD partitioner inserts
    the psum for the loss's log-softmax reduction and the all-gathers for
    sharded-table embedding lookups), everything else replicated.

    Multi-process: every host holds the full (same-seed) value, so each leaf
    is assembled with ``make_array_from_callback``."""
    single = jax.process_count() == 1

    def place(x):
        sh = NamedSharding(mesh, vocab_pspec(x, vocab_size))
        if single:
            return jax.device_put(x, sh)
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx, a=arr: a[idx])

    return jax.tree.map(place, tree)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data",
                seq_axis: Optional[str] = None,
                seq_fields: Sequence[str] = ("feats",)):
    """Place each array with its leading (batch) dim sharded over `axis`.

    ``seq_axis`` additionally shards dim 1 (mel time) of the ``seq_fields``
    arrays over that mesh axis — **sequence parallelism** for the encoder:
    XLA's SPMD partitioner spatially partitions the conv stack over the
    time-sharded input (inserting the exact halo exchanges) and each chip
    holds/computes only its slice of the long-clip activations, the
    dominant memory at Clotho lengths (T up to 3072).  The math is
    unchanged — the same config key reuses the 2-D mesh's ``model`` axis,
    composing with vocab tensor-parallelism.  Time must divide the axis
    extent (mel buckets are multiples of 32 — ``DEFAULT_BUCKETS``).

    Single-process: a plain ``device_put`` scatters the host array over the
    local devices.  Multi-process: each host holds only *its* rows of the
    global batch (``CaptionLoader(host_id, host_count)`` striding), so the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — every host contributes its
    shard and the global batch is the concatenation over processes.  The
    local batch must already be padded to a multiple of the host's local
    *data-axis* extent — ``pad_to_multiple(batch,
    mesh.local_mesh.shape["data"])`` — which is the local device count only
    on a 1-D mesh (batches replicate over any ``model`` axis)."""
    def spec_for(k, v):
        if (seq_axis is not None and k in seq_fields
                and getattr(v, "ndim", 0) >= 2):
            ext = mesh.shape[seq_axis]
            if v.shape[1] % ext:
                raise ValueError(
                    f"sequence-parallel dim {k}.shape[1]={v.shape[1]} does "
                    f"not divide the '{seq_axis}' axis ({ext}); mel buckets "
                    f"must be multiples of it")
            return P(axis, seq_axis)
        return P(axis)

    if jax.process_count() == 1:
        return {k: jax.device_put(v, NamedSharding(mesh, spec_for(k, v)))
                for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec_for(k, v)), np.asarray(v))
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
