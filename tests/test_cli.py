"""End-to-end CLI test: build_vocab → train → evaluate → predict → diversity
on a synthetic HDF5 Clotho-mini (exercises orbax checkpoints too)."""
import json
import os

import h5py
import numpy as np
import pytest
import yaml

from acvae_tpu.cli.main import Runner, main
from acvae_tpu.data.synthetic import make_synthetic_clotho


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    feats, info, _ = make_synthetic_clotho(num_audios=6, mel_frames=128)
    h5path = str(root / "mels.h5")
    with h5py.File(h5path, "w") as f:
        for aid, mel in feats.items():
            f[aid] = mel
    import pandas as pd
    pd.DataFrame({"audio_id": list(feats), "hdf5_path": h5path}).to_csv(
        root / "mels.csv", sep="\t", index=False)
    with open(root / "text.json", "w") as f:
        json.dump({"audios": info}, f)

    config = {
        "model": "Hybrid_VAEModel",
        "alpha": 0.5,
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": 16, "channels": [4, 8, 8, 16]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": 16, "hidden_size": 16},
        "model_args": {
            "posterior_model": "PosteriorRNN_hybrid",
            "posterior_args": {"hidden_size": 16},
            "prior_model": "PriorRNN",
            "prior_args": {"hidden_size": 16},
        },
        "h5_csv": str(root / "mels.csv"),
        "caption_file": str(root / "text.json"),
        "vocab_file": str(root / "vocab.pkl"),
        "outputpath": str(root / "experiments"),
        "epochs": 2,
        "batch_size": 8,
        "train_percent": 80,
        "optimizer_args": {"lr": 1e-3},
        "scheduler": "constant",
        "scheduler_args": {},
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return root


class TestCLI:
    def test_stage_hook_single_kill_switch(self, monkeypatch):
        """_stage_hook is the ONLY reader of ACVAE_UPLOAD_OVERLAP: off
        disables every staged loop at once; feats_dtype threads the train
        loop's bf16 upload cast through the same gate."""
        import ml_dtypes

        from acvae_tpu.cli.main import _stage_hook, _stage_to_device

        monkeypatch.setenv("ACVAE_UPLOAD_OVERLAP", "0")
        assert _stage_hook() is None
        assert _stage_hook(feats_dtype=ml_dtypes.bfloat16) is None

        monkeypatch.setenv("ACVAE_UPLOAD_OVERLAP", "1")
        assert _stage_hook() is _stage_to_device
        staged = _stage_hook(feats_dtype=ml_dtypes.bfloat16)
        assert staged is not None and staged is not _stage_to_device
        assert staged.keywords == {"feats_dtype": ml_dtypes.bfloat16}

    def test_build_vocab(self, workspace):
        out = Runner().build_vocab(str(workspace / "text.json"),
                                   str(workspace / "vocab.pkl"))
        assert os.path.exists(out)

    def test_train(self, workspace):
        exp_dir = Runner().train(str(workspace / "config.yaml"), seed=3)
        assert os.path.isdir(exp_dir)
        assert os.path.exists(os.path.join(exp_dir, "config.yaml"))
        assert os.path.isdir(os.path.join(exp_dir, "last"))
        lines = open(os.path.join(exp_dir, "metrics.jsonl")).readlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert np.isfinite(rec["train_loss"])
        self.__class__.exp_dir = exp_dir

    def test_evaluate_beam(self, workspace):
        scores = Runner().evaluate(self.exp_dir, checkpoint="last")
        assert "CIDEr" in scores and np.isfinite(scores["CIDEr"])
        assert os.path.exists(os.path.join(self.exp_dir,
                                           "eval_output_beam_3.json"))

    def test_evaluate_dbs_multicandidate(self, workspace):
        # "method" is the reference's flag name (base_runner.py:199) —
        # exercised here as the alias for decode_method
        scores = Runner().evaluate(self.exp_dir, checkpoint="last",
                                   method="dbs", beam_size=4,
                                   group_size=2)
        out = json.load(open(os.path.join(
            self.exp_dir, "eval_output_dbs_4.json")))
        first = out["predictions"][0]
        assert "captions" in first and len(first["captions"]) == 4

    def test_diversity_cli(self, workspace):
        res = Runner().diversity(
            os.path.join(self.exp_dir, "eval_output_dbs_4.json"),
            str(workspace / "text.json"))
        assert "Div1" in res and "mBLeu_4" in res and "Novelty" in res

    def test_predict_csv(self, workspace, tmp_path):
        out = Runner().predict(self.exp_dir, str(workspace / "mels.csv"),
                               str(tmp_path / "pred.csv"), checkpoint="last")
        lines = open(out).read().strip().splitlines()
        assert lines[0] == "file_name,caption_predicted"
        assert len(lines) > 1

    def test_train_with_augment_downweight(self, workspace, tmp_path):
        """use_aug_prob wires augment_loss (loss.py:72-94) into the train
        step: captions whose cap_id carries an "aug" tag are stochastically
        dropped from the CE."""
        import yaml

        info = json.load(open(workspace / "text.json"))["audios"]
        for a in info:
            for ci, c in enumerate(a["captions"]):
                c["cap_id"] = f"{ci}" + ("_aug" if ci % 2 else "")
        aug_json = tmp_path / "text_aug.json"
        aug_json.write_text(json.dumps({"audios": info}))
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        cfg.update(caption_file=str(aug_json), use_aug_prob=0.5,
                   outputpath=str(tmp_path / "exp_aug"))
        p = tmp_path / "c_aug.yaml"
        p.write_text(yaml.safe_dump(cfg))
        exp = Runner().train(str(p), seed=9, remark="aug")
        rec = json.loads(open(os.path.join(exp, "metrics.jsonl")).readline())
        assert np.isfinite(rec["train_loss"])

    def test_train_bf16_upload(self, workspace, tmp_path):
        """upload_dtype: bfloat16 halves the host->device feature bytes
        (the dominant per-step transfer); training stays sane."""
        import yaml
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        cfg.update(upload_dtype="bfloat16",
                   outputpath=str(tmp_path / "exp_bf16up"))
        p = tmp_path / "c_bf16.yaml"
        p.write_text(yaml.safe_dump(cfg))
        exp = Runner().train(str(p), seed=9, remark="bf16up")
        rec = json.loads(open(os.path.join(exp, "metrics.jsonl")).readline())
        assert np.isfinite(rec["train_loss"])
        with pytest.raises(ValueError):
            Runner().train(str(p), seed=9, remark="bad",
                           upload_dtype="float16")

    def test_train_profile_dir_writes_trace(self, workspace, tmp_path):
        """profile_dir traces the first training steps into a
        TensorBoard-viewable profile (train/profiling.py; the reference has
        no profiling at all — SURVEY §5)."""
        import yaml

        if not os.path.exists(workspace / "vocab.pkl"):
            Runner().build_vocab(str(workspace / "text.json"),
                                 str(workspace / "vocab.pkl"))
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        prof = tmp_path / "prof"
        cfg.update(outputpath=str(tmp_path / "exp_prof"),
                   profile_dir=str(prof))
        p = tmp_path / "c_prof.yaml"
        p.write_text(yaml.safe_dump(cfg))
        Runner().train(str(p), seed=23, remark="prof")
        traces = list(prof.rglob("*.trace.json.gz")) + \
            list(prof.rglob("*.xplane.pb"))
        assert traces, f"no trace files under {prof}"

    def test_step_timer_and_trace_helper(self, tmp_path):
        """Unit coverage for train/profiling.py: StepTimer skips warmup and
        summarizes; trace() is a no-op without a logdir and writes a
        profile with one."""
        from acvae_tpu.train.profiling import StepTimer, trace

        t = StepTimer(warmup=1)
        for _ in range(4):
            with t:
                pass
        s = t.summary()
        assert len(t.times) == 3 and s["steps_per_s"] > 0
        assert s["p50_s"] <= s["p90_s"]

        with trace(None):  # no-op path
            pass
        logdir = tmp_path / "trace"
        import jax.numpy as jnp
        with trace(str(logdir)):
            jnp.zeros((8, 8)).sum().block_until_ready()
        found = list(logdir.rglob("*.xplane.pb")) + \
            list(logdir.rglob("*.trace.json.gz"))
        assert found, f"trace() wrote nothing under {logdir}"

    def test_train_loss_invariant_to_upload_overlap(self, workspace,
                                                    tmp_path, monkeypatch):
        """ACVAE_UPLOAD_OVERLAP changes only WHERE the host->device upload
        happens (producer thread vs in-dispatch), never the math: two runs
        differing only in the switch must produce identical train losses —
        the invariant the on-chip upload A/B relies on to compare wall
        times."""
        import yaml

        if not os.path.exists(workspace / "vocab.pkl"):
            Runner().build_vocab(str(workspace / "text.json"),
                                 str(workspace / "vocab.pkl"))
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        losses = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("ACVAE_UPLOAD_OVERLAP", flag)
            cfg["outputpath"] = str(tmp_path / f"exp_ov{flag}")
            p = tmp_path / f"c_ov{flag}.yaml"
            p.write_text(yaml.safe_dump(cfg))
            exp = Runner().train(str(p), seed=21, remark=f"ov{flag}")
            losses[flag] = [json.loads(l)["train_loss"]
                            for l in open(os.path.join(exp, "metrics.jsonl"))]
        assert losses["0"] == losses["1"]

    def test_preemption_recovery(self, workspace, tmp_path):
        """checkpoint_every_steps + fault_abort_step + resume: a run killed
        mid-epoch restarts from the step checkpoint, skips the consumed
        batches, and finishes all epochs (the reference's recovery is a
        manual per-epoch .pth reload — SURVEY §5 'failure detection:
        none')."""
        import yaml

        if not os.path.exists(workspace / "vocab.pkl"):
            Runner().build_vocab(str(workspace / "text.json"),
                                 str(workspace / "vocab.pkl"))
        cfg = yaml.safe_load(open(workspace / "config.yaml"))
        cfg.update(outputpath=str(tmp_path / "exp_pre"),
                   checkpoint_every_steps=1, fault_abort_step=1, epochs=2)
        p = tmp_path / "c_pre.yaml"
        p.write_text(yaml.safe_dump(cfg))
        with pytest.raises(SystemExit, match="injected failure at step 1"):
            Runner().train(str(p), seed=11, remark="pre")
        # the crash left a mid-epoch step snapshot but no epoch-end last
        import glob
        [exp] = glob.glob(str(tmp_path / "exp_pre" / "*" / "*" / "seed_11"))
        assert glob.glob(os.path.join(exp, "step_*"))
        assert not os.path.isdir(os.path.join(exp, "last"))
        exp2 = Runner().train(str(p), seed=11, remark="pre", resume=True,
                              fault_abort_step=0)
        assert exp2 == exp
        log = open(os.path.join(exp, "train_caption.log")).read()
        assert "resumed from" in log and "skipping 1 consumed batches" in log
        lines = open(os.path.join(exp, "metrics.jsonl")).readlines()
        assert json.loads(lines[-1])["epoch"] == 2
        # the stale step snapshots are dropped once `last` supersedes them
        assert os.path.isdir(os.path.join(exp, "last"))
        assert not glob.glob(os.path.join(exp, "step_*"))
        # best-score + step meta survives for the next resume
        meta = json.load(open(os.path.join(exp, "ckpt_steps.json")))
        assert "last" in meta and "best_score" in meta

    def test_ss_ratio_closed_form(self):
        """ss_ratio_at(i) must equal i iterative update_ss_ratio steps."""
        from acvae_tpu.train.trainer import ss_ratio_at, update_ss_ratio
        for mode in ("exponential", "linear"):
            r = 0.9
            for i in range(1, 60):
                r = update_ss_ratio(r, mode, total_iters=100,
                                    final_ss_ratio=0.7)
                assert abs(r - ss_ratio_at(i, 0.9, mode, 100, 0.7)) < 1e-9

    def test_predict_from_kaldi_scp(self, workspace, tmp_path):
        """Kaldi scp feature manifests drive predict (the legacy data path
        of runners/ensemble.py:23-218, reader data/kaldi.py)."""
        import h5py

        from acvae_tpu.data.kaldi import write_mat_ark
        with h5py.File(str(workspace / "mels.h5"), "r") as f:
            mats = {k: np.asarray(f[k], np.float32) for k in list(f)[:3]}
        ark = str(tmp_path / "feats.ark")
        scp = str(tmp_path / "feats.scp")
        write_mat_ark(ark, mats, scp_path=scp)
        out = Runner().predict(self.exp_dir, scp,
                               str(tmp_path / "pred_kaldi.csv"),
                               checkpoint="last")
        lines = open(out).read().strip().splitlines()
        assert len(lines) == 1 + len(mats)
        assert sorted(l.split(",")[0] for l in lines[1:]) == sorted(mats)

    def test_evaluate_int8(self, workspace):
        """encoder_int8 runs the full evaluate harness through the int8
        serving encoder and writes suffixed artifacts."""
        scores = Runner().evaluate(self.exp_dir, checkpoint="last",
                                   encoder_int8=True)
        assert "CIDEr" in scores and np.isfinite(scores["CIDEr"])
        assert os.path.exists(os.path.join(self.exp_dir,
                                           "eval_output_beam_3_int8.json"))
        assert os.path.exists(os.path.join(self.exp_dir,
                                           "scores_beam_3_int8.txt"))
        # the round-1 scheme stays addressable for accuracy A/Bs and writes
        # its own artifacts (no clobbering of the v2 run above)
        scores_v1 = Runner().evaluate(self.exp_dir, checkpoint="last",
                                      encoder_int8=True, int8_scheme="v1")
        assert np.isfinite(scores_v1["CIDEr"])
        assert os.path.exists(os.path.join(self.exp_dir,
                                           "scores_beam_3_int8v1.txt"))
        # v3 (bake-time accuracy levers, v2sym runtime) evaluates too
        scores_v3 = Runner().evaluate(self.exp_dir, checkpoint="last",
                                      encoder_int8=True, int8_scheme="v3")
        assert np.isfinite(scores_v3["CIDEr"])
        assert os.path.exists(os.path.join(self.exp_dir,
                                           "scores_beam_3_int8v3.txt"))
        with pytest.raises(ValueError):
            Runner().evaluate(self.exp_dir, checkpoint="last",
                              encoder_int8=True, int8_scheme="v9")

    def test_load_raw_checkpoint_subset_restores_host_numpy(self, workspace):
        """Cross-platform guarantee: the metadata-template (subset) read
        must restore leaves as HOST numpy, never reviving the save-time
        device sharding — a TPU-written checkpoint otherwise refuses to
        load in a CPU process ("Device TPU v5 lite0 was not found in
        jax.local_devices()"), which broke `cli export_model` on the
        round-5 arm-1 checkpoints."""
        import jax
        import numpy as onp

        from acvae_tpu.train.checkpoints import load_raw_checkpoint

        tree = load_raw_checkpoint(self.exp_dir, "last",
                                   subset=("params", "batch_stats"))
        leaves = jax.tree_util.tree_leaves(tree["params"])
        assert leaves and all(isinstance(x, onp.ndarray) for x in leaves)

    def test_average_checkpoints(self, workspace):
        """SWA-style weight averaging: avg = mean(best, last) elementwise,
        saved as a named checkpoint that evaluate can consume."""
        import jax
        import numpy as onp

        from acvae_tpu.train.checkpoints import load_raw_checkpoint

        import orbax.checkpoint as ocp

        # guaranteed-distinct second member: alt = 3 * last, so
        # mean(last, alt) must equal exactly 2 * last leafwise
        last = load_raw_checkpoint(self.exp_dir, "last")
        alt = dict(last)
        alt["params"] = jax.tree.map(lambda x: 3.0 * x, last["params"])
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(self.exp_dir, "alt"), alt, force=True)
        ckptr.wait_until_finished()
        Runner().average_checkpoints(self.exp_dir, names="last,alt")
        avg = load_raw_checkpoint(self.exp_dir, "avg")
        for xa, xl in zip(jax.tree_util.tree_leaves(avg["params"]),
                          jax.tree_util.tree_leaves(last["params"])):
            onp.testing.assert_allclose(onp.asarray(xa),
                                        2.0 * onp.asarray(xl), rtol=1e-6)
        with pytest.raises(ValueError, match="distinct"):
            Runner().average_checkpoints(self.exp_dir, names="last,last")
        with pytest.raises(FileNotFoundError):
            Runner().average_checkpoints(self.exp_dir, names="last,nope")
        # evaluate(checkpoint=avg) overwrites the beam-3 artifacts the
        # earlier checkpoint=last evaluation wrote — snapshot and restore
        import shutil
        arts = [os.path.join(self.exp_dir, n)
                for n in ("eval_output_beam_3.json", "scores_beam_3.txt")]
        saved = {a: a + ".orig" for a in arts if os.path.exists(a)}
        for a, s in saved.items():
            shutil.copy(a, s)
        try:
            scores = Runner().evaluate(self.exp_dir, checkpoint="avg")
        finally:
            for a, s in saved.items():
                shutil.move(s, a)
        assert "CIDEr" in scores and np.isfinite(scores["CIDEr"])

    def test_export_model_roundtrip(self, workspace, tmp_path):
        """jax.export deployment artifact: serialize the trained beam decode
        (weights baked in), deserialize WITHOUT model code, and get
        token-identical sequences to the live jitted decode."""
        import jax
        import jax.numpy as jnp

        from acvae_tpu.export import load_exported

        out = Runner().export_model(self.exp_dir, checkpoint="last",
                                    t_mel=128, max_length=8,
                                    output_dir=str(tmp_path / "export"),
                                    platforms="cpu,tpu")
        decode, meta = load_exported(out)
        assert meta["decode_method"] == "beam" and meta["t_mel"] == 128
        # multi-platform lowering: a CPU host produced a TPU-servable export
        assert meta["platforms"] == ["cpu", "tpu"]
        # the documented contract: one artifact, any batch — a silent
        # fallback to a pinned batch is a regression, not an alternative
        assert meta["batch"] == "symbolic"
        assert os.path.exists(os.path.join(out, "vocab.pkl"))

        rng = np.random.default_rng(5)
        n = 4
        feats = jnp.asarray(rng.normal(size=(n, 128, 64)).astype(np.float32))
        lens = jnp.full((n,), 128, jnp.int32)
        out_art = decode(feats, lens, jnp.uint32(7))
        assert "scores" in out_art, \
            "artifact must carry beam scores for re-ranking tooling"
        got = np.asarray(out_art["seqs"])

        # live reference decode with the same seed
        from acvae_tpu.core.config import load_config
        from acvae_tpu.data.vocab import Vocabulary
        from acvae_tpu.models.build import build_model
        from acvae_tpu.train.checkpoints import load_raw_checkpoint

        conf = load_config(os.path.join(self.exp_dir, "config.yaml"))
        vocab = Vocabulary.load(os.path.join(self.exp_dir, "vocab.pkl"))
        model = build_model(conf, len(vocab), 64)
        tree = load_raw_checkpoint(self.exp_dir, "last")
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
        want = np.asarray(model.apply(
            variables, feats, lens, decode_method="beam", beam_size=3,
            max_length=8, rngs={"sample": jax.random.key(jnp.uint32(7))})
            ["seqs"])
        np.testing.assert_array_equal(got, want)

    def test_export_model_int8_roundtrip(self, workspace, tmp_path):
        """--encoder_int8 bakes the quantized serving encoder into the
        artifact; the deserialized program matches the live int8 decode
        token-for-token."""
        import jax
        import jax.numpy as jnp

        from acvae_tpu.core.config import load_config
        from acvae_tpu.data.vocab import Vocabulary
        from acvae_tpu.export import load_exported
        from acvae_tpu.models.build import build_model
        from acvae_tpu.models.quant import int8_decode_fn, quant_encoder_for
        from acvae_tpu.train.checkpoints import load_raw_checkpoint

        out = Runner().export_model(self.exp_dir, checkpoint="last",
                                    t_mel=128, max_length=8,
                                    encoder_int8=True,
                                    output_dir=str(tmp_path / "exp_i8"))
        decode, meta = load_exported(out)
        assert meta["encoder_int8"] is True

        rng = np.random.default_rng(6)
        feats = jnp.asarray(rng.normal(size=(4, 128, 64)).astype(np.float32))
        lens = jnp.full((4,), 128, jnp.int32)
        got = np.asarray(decode(feats, lens, jnp.uint32(9))["seqs"])

        conf = load_config(os.path.join(self.exp_dir, "config.yaml"))
        vocab = Vocabulary.load(os.path.join(self.exp_dir, "vocab.pkl"))
        model = build_model(conf, len(vocab), 64)
        tree = load_raw_checkpoint(self.exp_dir, "last")
        variables = {"params": tree["params"],
                     "batch_stats": tree.get("batch_stats", {})}
        quant = quant_encoder_for(conf, model, variables["params"],
                                  variables["batch_stats"])
        live = int8_decode_fn(model, quant, decode_method="beam",
                              beam_size=3, max_length=8)
        want = np.asarray(live(variables, feats, lens,
                               jax.random.key(jnp.uint32(9)))["seqs"])
        np.testing.assert_array_equal(got, want)

    def test_main_dispatch(self, workspace, capsys):
        main(["diversity",
              os.path.join(self.exp_dir, "eval_output_dbs_4.json")])
        captured = capsys.readouterr()
        assert "Div1" in captured.out


def test_sweep_isolate_trials_subprocess(workspace):
    """--isolate_trials runs each trial as its own `cli train` process
    (per-trial memory isolation — a 25-epoch chip trial grows the host
    process ~3.5 GB/epoch, measured round 5) while preserving the result
    summary; the parent computes each trial's experiment dir the same way
    train does."""
    Runner().build_vocab(str(workspace / "text.json"),
                         str(workspace / "vocab.pkl"))
    res = Runner().sweep(str(workspace / "config.yaml"),
                         param="beta", values="0.5,0.4",
                         metric="val_cider", epochs=1,
                         isolate_trials=True)
    assert len(res) == 2
    for tag, r in res.items():
        assert os.path.isdir(r["exp_dir"]), tag
        assert os.path.exists(os.path.join(r["exp_dir"], "metrics.jsonl"))
        assert isinstance(r["best"], float)
