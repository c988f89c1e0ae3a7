"""Interleaved A/B probe for the prefetch-staged device upload.

The serial 3-epoch CLI A/B (ACVAE_UPLOAD_OVERLAP=0/1, two `cli train`
runs) is unresolvable on this platform: tunnel throughput drifts by tens
of percent *within* a run (RESULTS.md "Upload-overlap A/B"), swamping the
effect.  This probe measures the same thing drift-free: one process, one
compiled train step, the two upload strategies alternated round-robin —
every round compares them seconds apart on the same tunnel state.

  OFF       — host numpy batches go straight into the jitted step; the
              runtime transfers them inside ONE dispatch (lower bound for
              an unstaged loop).
  OFF-ASARR — the loop jnp.asarray's each array before the step — the
              framework's real unstaged path (ACVAE_UPLOAD_OVERLAP=0:
              cli/main.py stages with jnp.asarray in the loop body).  Over
              a tunneled runtime each asarray is its own round-trip.
  ON        — a producer thread device_puts batch i+1 while step i runs
              (exactly `cli/main.py::_stage_to_device` from the prefetch
              hook).

Usage:  python tools/probe_upload.py [steps_per_round] [rounds] [batch]
Defaults: 12 steps x 4 rounds at batch 32, T=1024 (the real-recipe epoch
regime design.md calls upload-bound: ~29 ms/step compute in ~192 ms wall).
"""
from __future__ import annotations

import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    t_mel = 1024

    import jax

    from __graft_entry__ import _build_flagship, _example_batch
    from acvae_tpu.train.trainer import (TrainState, build_optimizer,
                                         make_train_step)

    vocab = 4981
    model = _build_flagship(vocab_size=vocab, enc_dtype=jax.numpy.bfloat16)
    feats, feat_lens, caps, cap_lens = _example_batch(
        n=batch, t_mel=t_mel, vocab=vocab)
    variables = jax.jit(lambda k1, k2: model.init(
        {"params": k1, "sample": k2}, feats, feat_lens, caps, cap_lens,
        train=False))(jax.random.key(0), jax.random.key(1))
    state = TrainState.create(variables,
                              build_optimizer("Adam", 1e-3,
                                              max_grad_norm=1.0))
    # donate=False: the state must survive both arms' timing loops
    step = make_train_step(model, alpha=0.1, global_loss="MSE", donate=False)

    # distinct host batches (so the runtime cannot cache the transfer)
    rng = np.random.default_rng(7)
    host_batches = []
    for i in range(steps):
        host_batches.append({
            "feats": rng.normal(size=(batch, t_mel, 64)).astype(np.float32),
            "feat_lens": np.full((batch,), t_mel, np.int32),
            "caps": np.asarray(caps),
            "cap_lens": np.asarray(cap_lens),
        })

    def run_step(st, b, i):
        return step(st, b, jax.random.key(100 + i), 0.9, 0.2, 0.5, 0.1)

    # compile + settle
    st, m = run_step(state, host_batches[0], 0)
    np.asarray(m["loss"])

    def arm_off(st):
        t0 = time.perf_counter()
        for i, b in enumerate(host_batches):
            st, m = run_step(st, b, i)
        np.asarray(m["loss"])  # force completion (block_until_ready is a lie here)
        return time.perf_counter() - t0, st

    def arm_off_asarray(st):
        import jax.numpy as jnp
        t0 = time.perf_counter()
        for i, b in enumerate(host_batches):
            st, m = run_step(st, {k: jnp.asarray(v) for k, v in b.items()}, i)
        np.asarray(m["loss"])
        return time.perf_counter() - t0, st

    def arm_on(st):
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            for b in host_batches:
                q.put({k: jax.device_put(v) for k, v in b.items()})
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        t0 = time.perf_counter()
        th.start()
        i = 0
        while True:
            b = q.get()
            if b is None:
                break
            st, m = run_step(st, b, i)
            i += 1
        np.asarray(m["loss"])
        return time.perf_counter() - t0, st

    arms = [("off", arm_off), ("off_asarr", arm_off_asarray),
            ("on", arm_on)]
    per = {name: [] for name, _ in arms}
    for r in range(rounds):
        # rotate the order each round: a fixed order would attribute any
        # monotonic within-round drift to the same arm every time
        order = arms[r % len(arms):] + arms[: r % len(arms)]
        for name, arm in order:
            dt, state = arm(state)
            ms = dt / steps * 1000
            per[name].append(ms)
            print(f"round {r} {name:9s}: {ms:7.1f} ms/step "
                  f"({steps} steps, batch {batch})", flush=True)
    for name, _ in arms:
        v = sorted(per[name])
        print(f"{name:9s}: median {v[len(v) // 2]:.1f} ms/step "
              f"(min {v[0]:.1f}, max {v[-1]:.1f})", flush=True)


if __name__ == "__main__":
    main()
