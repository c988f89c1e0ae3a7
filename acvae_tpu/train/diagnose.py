"""Posterior/latent diagnostics over a trained experiment (``cli diagnose``).

Runs a few training-forward batches through a checkpoint and reports the
posterior-collapse statistics the round-4 trainer logs live (per-dim KL
spectrum, active units, prior↔posterior agreement) plus teacher-forced CE
under posterior z (dis_ratio=0) and prior z (dis_ratio=1) — the quantity
the dis-ratio ramp trades.  This is the offline/forensic counterpart of
the in-training metrics.jsonl diagnostics; no reference counterpart (the
reference logs loss/score only, runners/pytorch_runner_vae.py:336-357).

Works cross-platform: checkpoints written on the TPU restore into the
host's placement (train/checkpoints.py restore_args), so diagnosis runs
on CPU while the chip trains.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def diagnose_experiment(exp_dir: str, h5_csv: str | None = None,
                        caption_file: str | None = None,
                        batches: int = 6, batch_size: int = 32,
                        checkpoint: str = "best", seed: int = 0) -> Dict[str, Any]:
    from acvae_tpu.core.config import load_config
    from acvae_tpu.data import CaptionDataset, CaptionLoader
    from acvae_tpu.data.vocab import Vocabulary, load_caption_info
    from acvae_tpu.models.build import build_model
    from acvae_tpu.ops.losses import (cross_entropy, normal_kl_loss,
                                      normal_kl_per_dim)
    from acvae_tpu.ops.masked import length_mask
    from acvae_tpu.train.checkpoints import restore_checkpoint

    exp = Path(exp_dir)
    conf = load_config(str(exp / "config.yaml"))
    vocabulary = Vocabulary.load(str(exp / "vocab.pkl"))
    info = load_caption_info(caption_file or conf["caption_file"],
                             conf.get("zh", False))
    from acvae_tpu.cli.main import _feature_source
    src = _feature_source(h5_csv or conf["h5_csv"])
    ds = CaptionDataset(**src, caption_info=info, vocabulary=vocabulary)
    loader = CaptionLoader(ds, batch_size, shuffle=True, seed=seed)

    model = build_model(conf, len(vocabulary), ds.data_dim)
    b0 = next(iter(loader))
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            jnp.asarray(b0.feats), jnp.asarray(b0.feat_lens),
            jnp.asarray(b0.caps), jnp.asarray(b0.cap_lens), train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    class _Shell:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        def replace(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)
            return self

    state = restore_checkpoint(str(exp), checkpoint, _Shell(),
                               params_only=True)
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
        ce = cross_entropy(out["logits"], caps[:, 1:], mask)
        if "q_means" not in out or out["p_means"].ndim == out["q_means"].ndim + 1:
            # plain captioner or GMM prior: CE only (no per-dim Normal KL)
            z = jnp.zeros((1,))
            return z, jnp.zeros(()), ce, jnp.zeros(()), jnp.zeros(())
        km = mask if out["q_means"].ndim >= 3 else None
        kl_d = normal_kl_per_dim(out["q_means"], out["q_logs"],
                                 out["p_means"], out["p_logs"], km)
        kl = normal_kl_loss(out["q_means"], out["q_logs"],
                            out["p_means"], out["p_logs"], km)
        qp = jnp.mean((out["q_means"] - out["p_means"]) ** 2, axis=-1)
        if km is None:
            qp_mse = jnp.mean(qp)
        else:
            mf = km.astype(qp.dtype)
            qp_mse = jnp.sum(qp * mf) / jnp.maximum(jnp.sum(mf), 1.0)
        # posterior-mean spread over VALID positions only (padded frames
        # carry qnet outputs conditioned on pad tokens and would bias the
        # variance): weighted mean/var with the caption mask
        q = out["q_means"]
        if km is None:
            q_flat = q.reshape(-1, q.shape[-1])
            q_var = jnp.mean(jnp.var(q_flat, axis=0))
        else:
            w = km.astype(q.dtype)[..., None]
            denom = jnp.maximum(jnp.sum(w), 1.0)
            mu = jnp.sum(q * w, axis=(0, 1)) / denom
            q_var = jnp.mean(
                jnp.sum(w * (q - mu) ** 2, axis=(0, 1)) / denom)
        return kl_d, kl, ce, qp_mse, q_var

    acc: Dict[str, list] = {k: [] for k in
                            ("kl_d", "kl", "ce_post", "ce_prior",
                             "qp_mse", "q_var")}
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
    has_kl = kl_d.shape[0] > 1
    res: Dict[str, Any] = {
        "exp": str(exp), "checkpoint": checkpoint,
        "n_batches": len(acc["kl"]),
        # stats_fn runs the TRAINING forward (train=True: live dropout,
        # batch-mode BN) because the z-chain being diagnosed is the one
        # training optimizes; ce_* therefore include dropout noise and are
        # not inference-mode CEs — compare them paired (posterior vs prior
        # share one rng key), not against eval-time losses.
        "forward_mode": "train",
        "ce_posterior_z": round(float(np.mean(acc["ce_post"])), 4),
        "ce_prior_z": round(float(np.mean(acc["ce_prior"])), 4),
        "ce_prior_penalty": round(float(np.mean(acc["ce_prior"]))
                                  - float(np.mean(acc["ce_post"])), 4),
    }
    if has_kl:
        res.update({
            "kl_total": round(float(np.mean(acc["kl"])), 4),
            "active_units_0.01": int(np.sum(kl_d > 0.01)),
            "active_units_0.1": int(np.sum(kl_d > 0.1)),
            "latent_dims": int(kl_d.shape[0]),
            "kl_dim_top8": [round(float(x), 4) for x in spectrum[:8]],
            "qp_mse": round(float(np.mean(acc["qp_mse"])), 5),
            "q_mean_var": round(float(np.mean(acc["q_var"])), 5),
        })
    return res
