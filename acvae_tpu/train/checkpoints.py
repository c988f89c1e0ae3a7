"""Orbax checkpointing with the reference's best/last policy.

The reference dumps ``{model, optimizer, lr_scheduler, vocabulary}`` to
``best.pth`` / ``last.pth`` gated by ``criterion_improver``
(``runners/pytorch_runner_vae.py:380-388``, ``utils/train_util.py:117-131``).
Here the TrainState pytree (params + batch_stats + opt state + step) goes
through orbax; vocabulary and config are stored beside it.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from acvae_tpu.core.config import dump_config
from acvae_tpu.data.vocab import Vocabulary


def save_checkpoint(exp_dir: str, name: str, state, vocabulary: Optional[Vocabulary] = None,
                    config: Optional[dict] = None) -> None:
    path = os.path.join(os.path.abspath(exp_dir), name)
    ckptr = ocp.StandardCheckpointer()
    tree = {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    # multi-process: orbax coordinates the array save across all processes
    # (every process must call save), but the host-side files are written
    # once, by the primary
    if jax.process_index() == 0:
        if vocabulary is not None:
            vocabulary.save(os.path.join(exp_dir, "vocab.pkl"))
        if config is not None:
            dump_config(config, os.path.join(exp_dir, "config.yaml"))


def _write_meta(exp_dir: str, steps: dict) -> None:
    """Atomic (tmp + rename) write — ckpt_steps.json is written exactly when
    preemptions strike, so a torn write must never brick resume."""
    import json
    path = os.path.join(exp_dir, "ckpt_steps.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(steps, f)
    os.replace(tmp, path)


def write_ckpt_step(exp_dir: str, name: str, step: int, **extra) -> None:
    """Record a checkpoint's step count (plus any extra scalars, e.g. the
    best val score or plateau-scheduler state) in ``ckpt_steps.json`` so
    resume can pick the newest checkpoint and re-seed host-side training
    state."""
    if jax.process_index() != 0:
        return
    steps = read_ckpt_steps(exp_dir)
    steps[name] = int(step)
    steps.update(extra)
    _write_meta(exp_dir, steps)


def read_ckpt_steps(exp_dir: str) -> dict:
    """Tolerates a missing or torn file (empty dict) — resume must survive
    a preemption that landed mid-write before the writes became atomic."""
    import json
    path = os.path.join(exp_dir, "ckpt_steps.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        logging.getLogger("acvae_tpu").warning(
            "ckpt_steps.json in %s is unreadable; ignoring it", exp_dir)
        return {}


def remove_checkpoint(exp_dir: str, name: str) -> None:
    """Drop a stale checkpoint dir (e.g. the mid-epoch ``step`` checkpoints
    once the epoch-end ``last`` supersedes them).  Primary-only: checkpoints
    live on a filesystem every process can read (same assumption orbax's
    own save path makes here)."""
    import shutil
    if jax.process_index() != 0:
        return
    path = os.path.join(os.path.abspath(exp_dir), name)
    if os.path.isdir(path):
        shutil.rmtree(path)
    steps = read_ckpt_steps(exp_dir)
    if name in steps:
        del steps[name]
        _write_meta(exp_dir, steps)


#: resume candidates: epoch-end `last`, alternating mid-epoch slots
#: (`step_0`/`step_1` — two slots so the in-progress save can never destroy
#: the only snapshot), plus legacy single-slot `step` dirs
RESUME_CANDIDATES = ("last", "step_0", "step_1", "step")


def resume_newest(exp_dir: str, state):
    """Restore the newest available checkpoint.

    The *restored* ``state.step`` is authoritative — never the meta: a crash
    between an orbax save and its ``ckpt_steps.json`` update leaves the meta
    stale in EITHER direction (stale-high: meta written, save torn;
    stale-low: save completed, meta not yet updated — or the meta file
    itself torn/missing).  So every restorable candidate is tried and the
    largest actual step wins; with at most three candidates
    (``last`` + two alternating step slots) the extra reads are negligible
    next to losing up to 2×``checkpoint_every_steps`` of progress to a
    stale-low meta.  Returns ``(state, name)``; ``(state, None)`` when
    nothing restorable exists."""
    meta = read_ckpt_steps(exp_dir)
    avail = [n for n in RESUME_CANDIDATES
             if os.path.isdir(os.path.join(os.path.abspath(exp_dir), n))]
    if not avail:
        return state, None
    # meta-recorded step, then `last` on ties (its host files are complete)
    avail.sort(key=lambda n: (meta.get(n, -1), n == "last"), reverse=True)
    best, best_name = None, None
    for n in avail:
        try:
            s = restore_checkpoint(exp_dir, n, state, on_mismatch="raise")
        except Exception as e:  # half-written snapshot: try the next one
            logging.getLogger("acvae_tpu").warning(
                "checkpoint %s/%s unrestorable (%s); trying older ones",
                exp_dir, n, type(e).__name__)
            continue
        if best is None or int(s.step) > int(best.step):
            best, best_name = s, n
    if best is None:
        raise RuntimeError(
            f"resume: no checkpoint in {exp_dir} could be restored "
            f"(tried {avail})")
    return best, best_name


def _resolve_checkpoint_path(exp_dir: str, name: str) -> str:
    """A run whose validation score never beat 0 writes no ``best``
    checkpoint (the reference's criterion_improver starts at 0,
    train_util.py:119 — same here); fall back to ``last`` with a warning
    instead of crashing."""
    path = os.path.join(os.path.abspath(exp_dir), name)
    if name == "best" and not os.path.isdir(path):
        last = os.path.join(os.path.abspath(exp_dir), "last")
        if os.path.isdir(last):
            logging.getLogger("acvae_tpu").warning(
                "no 'best' checkpoint in %s (validation never improved); "
                "using 'last'", exp_dir)
            path = last
    return path


def restore_checkpoint(exp_dir: str, name: str, state, params_only=False,
                       on_mismatch: str = "fallback"):
    """Restore into the structure of `state` (a freshly created TrainState).

    ``params_only=True`` restores just params/batch_stats (fresh optimizer)
    — what fine-tuning stages (scst) and inference want.  A full restore
    whose optimizer-state *structure* no longer matches (checkpoint written
    by a different optimizer chain/version — orbax raises ValueError /
    KeyError / TypeError for these) falls back to params-only with a
    warning; other failures (I/O errors, truncated checkpoints) re-raise.
    ``on_mismatch="raise"`` disables the fallback entirely — use it on
    ``--resume`` paths, where silently resetting the optimizer and step
    counter would restart warmup without the user noticing."""
    path = _resolve_checkpoint_path(exp_dir, name)
    ckptr = ocp.StandardCheckpointer()
    if not params_only:
        template = {"step": state.step, "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state}
        try:
            restored = ckptr.restore(path, template)
            return state.replace(**restored)
        except (ValueError, KeyError, TypeError) as e:
            # template/structure mismatch only; anything else propagates
            if on_mismatch == "raise":
                raise
            logging.getLogger("acvae_tpu").warning(
                "templated restore of %s failed (%s: %s); restoring "
                "params/batch_stats only and resetting the optimizer",
                path, type(e).__name__, str(e).splitlines()[0])
    # partial restore: don't deserialize opt_state at all (Adam mu/nu is
    # ~2x the params bytes — wasted I/O on every inference-side load)
    item = {"params": state.params}
    if state.batch_stats:
        item["batch_stats"] = state.batch_stats
    # restore into the TEMPLATE's placement, not the sharding recorded at
    # save time: a checkpoint written on the TPU otherwise refuses to load
    # in a CPU process ("Device TPU v5 lite0 was not found") — the
    # cross-platform path the diagnosis/offline tools need
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(sharding=x.sharding)
        if hasattr(x, "sharding") else ocp.RestoreArgs(), item)
    try:
        restored = ocp.PyTreeCheckpointer().restore(
            path, args=ocp.args.PyTreeRestore(item=item,
                                              restore_args=restore_args,
                                              partial_restore=True))
    except Exception as e:
        # structure drift (e.g. checkpoint without batch_stats): retry with
        # the params subtree only, KEEPING the template-placement restore
        # args (the template-free StandardCheckpointer read would revive
        # the save-time sharding and fail cross-platform); the template-free
        # read stays as the last resort for exotic layouts
        logging.getLogger("acvae_tpu").warning(
            "partial restore of %s failed (%s: %s); retrying params-only",
            path, type(e).__name__, str(e).splitlines()[0])
        try:
            item_p = {"params": state.params}
            ra_p = {"params": restore_args["params"]}
            restored = ocp.PyTreeCheckpointer().restore(
                path, args=ocp.args.PyTreeRestore(item=item_p,
                                                  restore_args=ra_p,
                                                  partial_restore=True))
        except Exception:
            restored = ckptr.restore(path)
    return state.replace(params=restored["params"],
                         batch_stats=restored.get("batch_stats", {}))


def load_raw_checkpoint(exp_dir: str, name: str = "best",
                        subset: Optional[Tuple[str, ...]] = None):
    """Template-free restore of a checkpoint tree (e.g. a pretrained
    discriminator's params consumed by the ``adverse_loss`` train path).

    ``subset`` restricts deserialization to the named top-level keys using
    the checkpoint's own metadata as the template — inference-side consumers
    pass ``("params", "batch_stats", "step")`` to skip reading the Adam
    opt_state (~2x the params bytes).  Falls back to the full read if the
    metadata route fails (e.g. older orbax layouts)."""
    import numpy as np

    path = _resolve_checkpoint_path(exp_dir, name)
    ckptr = ocp.StandardCheckpointer()
    # restore every leaf as HOST numpy: without explicit restore_args orbax
    # revives the sharding recorded at save time, so a TPU-written
    # checkpoint refuses to load in a CPU process ("Device TPU v5 lite0
    # was not found") — the same cross-platform trap restore_checkpoint()
    # guards against, hit here by cli export_model/import consumers
    _as_np = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    if subset:
        try:
            md = ckptr.metadata(path).item_metadata.tree
            item = {k: jax.tree_util.tree_map(
                        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
                        md[k])
                    for k in subset if k in md}
            return ocp.PyTreeCheckpointer().restore(
                path, args=ocp.args.PyTreeRestore(item=item,
                                                  restore_args=_as_np(item),
                                                  partial_restore=True))
        except Exception as e:
            logging.getLogger("acvae_tpu").warning(
                "partial restore of %s failed (%s); reading the full tree",
                path, type(e).__name__)
    try:
        return ckptr.restore(path)
    except ValueError as e:
        if "not found in jax.local_devices" not in str(e):
            raise
        # cross-platform full read: metadata template + host-numpy leaves
        md = ckptr.metadata(path).item_metadata.tree
        item = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), md)
        return ocp.PyTreeCheckpointer().restore(
            path, args=ocp.args.PyTreeRestore(item=item,
                                              restore_args=_as_np(item)))


def criterion_improver(mode: str, initial: Optional[float] = None):
    """Closure tracking best value (utils/train_util.py:117-131).

    ``initial`` re-seeds the best value on resume (read back from
    ``ckpt_steps.json``) so a resumed run cannot overwrite a good ``best``
    checkpoint with a worse post-resume score; ``inner.best`` exposes the
    current value for persisting."""
    assert mode in ("loss", "acc", "score")
    best = (float("inf") if mode == "loss" else 0.0) \
        if initial is None else float(initial)

    def inner(x: float) -> bool:
        nonlocal best
        improved = x < best if mode == "loss" else x > best
        if improved:
            best = x
        inner.best = best
        return improved

    inner.best = best
    return inner
