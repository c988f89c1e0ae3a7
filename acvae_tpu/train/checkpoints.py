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
from typing import Optional

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


def write_ckpt_step(exp_dir: str, name: str, step: int) -> None:
    """Record a checkpoint's step count in ``ckpt_steps.json`` so resume can
    pick the newest of ``last`` (epoch-end) and ``step`` (mid-epoch,
    ``checkpoint_every_steps``) without restoring both."""
    import json
    if jax.process_index() != 0:
        return
    path = os.path.join(exp_dir, "ckpt_steps.json")
    steps = {}
    if os.path.exists(path):
        with open(path) as f:
            steps = json.load(f)
    steps[name] = int(step)
    with open(path, "w") as f:
        json.dump(steps, f)


def read_ckpt_steps(exp_dir: str) -> dict:
    import json
    path = os.path.join(exp_dir, "ckpt_steps.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def remove_checkpoint(exp_dir: str, name: str) -> None:
    """Drop a stale checkpoint dir (e.g. the mid-epoch ``step`` checkpoint
    once the epoch-end ``last`` supersedes it).  Primary-only: checkpoints
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
        import json
        del steps[name]
        with open(os.path.join(exp_dir, "ckpt_steps.json"), "w") as f:
            json.dump(steps, f)


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
    restored = ckptr.restore(path)
    return state.replace(params=restored["params"],
                         batch_stats=restored.get("batch_stats", {}))


def load_raw_checkpoint(exp_dir: str, name: str = "best"):
    """Template-free restore of a checkpoint tree (e.g. a pretrained
    discriminator's params consumed by the ``adverse_loss`` train path)."""
    path = _resolve_checkpoint_path(exp_dir, name)
    return ocp.StandardCheckpointer().restore(path)


def criterion_improver(mode: str):
    """Closure tracking best value (utils/train_util.py:117-131)."""
    assert mode in ("loss", "acc", "score")
    best = float("inf") if mode == "loss" else 0.0

    def inner(x: float) -> bool:
        nonlocal best
        improved = x < best if mode == "loss" else x > best
        if improved:
            best = x
        return improved

    return inner
