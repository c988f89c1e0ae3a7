"""Diagnose the rich25 seed bimodality from surviving checkpoints (CPU).

Loads each seed's `best` checkpoint, runs a few rich-corpus batches through
the *training* forward (teacher-forced posterior + autoregressive prior),
and prints the posterior-collapse diagnostics the round-4 trainer now logs
live (per-dim KL spectrum, active units, prior↔posterior agreement), plus
CE under both posterior z (dis_ratio=0) and prior z (dis_ratio=1) — the
quantity the dis-ratio ramp trades.

The hypothesis space (VERDICT round-3 "weak #1"): the ~0.32 basin either
(a) collapses the posterior (few active units → decoder ignores z, prior
is trivially matched, captions generic), or (b) keeps a rich posterior the
prior never learns to match (large qp_mse → decode-time prior z is
off-manifold and the decoder derails).  The two call for opposite
mitigations — free-bits for (a), slower/cyclical KL anneal or a longer
dis-ratio freeze for (b) — so measure before treating.

Usage (from repo root):
  JAX_PLATFORMS=cpu python tools/diagnose_basins.py \
      /tmp/rich_exp/Hybrid_VAEModel/rich25_0.5_0.5/seed_1 [seed_2 ...] \
      [--batches 6] [--json /tmp/basins.json]

No reference counterpart (the reference logs loss/score only,
runners/pytorch_runner_vae.py:336-357).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def diagnose(exp_dir: str, batches: int = 6, batch_size: int = 32,
             seed: int = 0) -> dict:
    from acvae_tpu.cli.main import _feature_source
    from acvae_tpu.data import CaptionDataset, CaptionLoader
    from acvae_tpu.data.vocab import Vocabulary
    from acvae_tpu.models.build import build_model
    from acvae_tpu.ops.losses import (cross_entropy, normal_kl_loss,
                                      normal_kl_per_dim)
    from acvae_tpu.ops.masked import length_mask
    from acvae_tpu.train.checkpoints import restore_checkpoint
    from acvae_tpu.core.config import load_config
    from acvae_tpu.data.vocab import load_caption_info

    exp = Path(exp_dir)
    conf = load_config(str(exp / "config.yaml"))
    vocabulary = Vocabulary.load(str(exp / "vocab.pkl"))
    info = load_caption_info(conf["caption_file"], conf.get("zh", False))
    src = _feature_source(conf["h5_csv"])
    ds = CaptionDataset(**src, caption_info=info, vocabulary=vocabulary)
    kw = {}
    if conf.get("buckets"):
        kw["buckets"] = tuple(conf["buckets"])
    loader = CaptionLoader(ds, batch_size, shuffle=True, seed=seed, **kw)

    model = build_model(conf, len(vocabulary), ds.data_dim)
    b0 = next(iter(loader))
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.asarray(b0.feats), jnp.asarray(b0.feat_lens),
            jnp.asarray(b0.caps), jnp.asarray(b0.cap_lens), train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    class _S:  # minimal TrainState stand-in for restore_checkpoint
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    state = restore_checkpoint(str(exp), "best", _S(), params_only=True)
    vars_run = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def stats_fn(feats, feat_lens, caps, cap_lens, key, dis_ratio):
        out, _ = model.apply(vars_run, feats, feat_lens, caps, cap_lens,
                             ss_ratio=1.0, dis_ratio=dis_ratio, train=True,
                             rngs={"sample": key,
                                   "dropout": jax.random.fold_in(key, 7)},
                             mutable=["batch_stats"])
        L = caps.shape[1]
        mask = length_mask(cap_lens - 1, L - 1)
        kl_d = normal_kl_per_dim(out["q_means"], out["q_logs"],
                                 out["p_means"], out["p_logs"], mask)
        kl = normal_kl_loss(out["q_means"], out["q_logs"],
                            out["p_means"], out["p_logs"], mask)
        ce = cross_entropy(out["logits"], caps[:, 1:], mask)
        qp = jnp.mean((out["q_means"] - out["p_means"]) ** 2, axis=-1)
        mf = mask.astype(qp.dtype)
        qp_mse = jnp.sum(qp * mf) / jnp.maximum(jnp.sum(mf), 1.0)
        # posterior scale: how far q strays from its own prior-agnostic
        # collapse point (variance of q means across the batch, per dim)
        q_flat = out["q_means"].reshape(-1, out["q_means"].shape[-1])
        q_var = jnp.mean(jnp.var(q_flat, axis=0))
        return kl_d, kl, ce, qp_mse, q_var

    acc = {"kl_d": [], "kl": [], "ce_post": [], "ce_prior": [],
           "qp_mse": [], "q_var": []}
    it = iter(loader)
    for i in range(batches):
        try:
            b = next(it)
        except StopIteration:
            break
        args = (jnp.asarray(b.feats), jnp.asarray(b.feat_lens),
                jnp.asarray(b.caps), jnp.asarray(b.cap_lens))
        key = jax.random.key(100 + i)
        kl_d, kl, ce_p, qp, qv = stats_fn(*args, key, 0.0)
        _, _, ce_prior, _, _ = stats_fn(*args, key, 1.0)
        acc["kl_d"].append(np.asarray(kl_d))
        acc["kl"].append(float(kl))
        acc["ce_post"].append(float(ce_p))
        acc["ce_prior"].append(float(ce_prior))
        acc["qp_mse"].append(float(qp))
        acc["q_var"].append(float(qv))

    kl_d = np.mean(np.stack(acc["kl_d"]), axis=0)
    spectrum = np.sort(kl_d)[::-1]
    return {
        "exp": str(exp),
        "n_batches": len(acc["kl"]),
        "kl_total": round(float(np.mean(acc["kl"])), 4),
        "active_units_0.01": int(np.sum(kl_d > 0.01)),
        "active_units_0.1": int(np.sum(kl_d > 0.1)),
        "latent_dims": int(kl_d.shape[0]),
        "kl_dim_top8": [round(float(x), 4) for x in spectrum[:8]],
        "qp_mse": round(float(np.mean(acc["qp_mse"])), 5),
        "q_mean_var": round(float(np.mean(acc["q_var"])), 5),
        "ce_posterior_z": round(float(np.mean(acc["ce_post"])), 4),
        "ce_prior_z": round(float(np.mean(acc["ce_prior"])), 4),
        "ce_prior_penalty": round(float(np.mean(acc["ce_prior"]))
                                  - float(np.mean(acc["ce_post"])), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dirs", nargs="+")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    results = []
    for d in args.exp_dirs:
        r = diagnose(d, args.batches, args.batch_size)
        results.append(r)
        print(json.dumps(r))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
