"""Every shipped configs/*.yaml trains end-to-end (tiny dims, synthetic data).

The config zoo is the user-facing entry surface — one file per reference
model family (`pytorch_runner_vae.py` flavors, `pytorch_runner.py` XE,
`run_sentence.py` regression, the pyc-only transformer/GMM variants, the
adversarial two-stage recipe).  This test pins each file to the
`build_model` / trainer schema so a zoo config can never rot: it is loaded
verbatim, shrunk to toy dimensions, and driven through one real
`cli train` epoch (including the beam-3 CIDEr validation pass).
"""
import glob
import json
import os

import h5py
import numpy as np
import pytest
import yaml

from acvae_tpu.cli.main import Runner
from acvae_tpu.data.synthetic import make_synthetic_clotho

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
TINY_EMB = 12  # sentence.yaml: embedding dim of the fixture tree


@pytest.fixture(scope="module")
def zoo_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo")
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
    Runner().build_vocab(str(root / "text.json"), str(root / "vocab.pkl"))
    # per-caption embedding tree for sentence.yaml
    rng = np.random.default_rng(0)
    for aud in info:
        d = root / "emb" / aud["audio_id"]
        d.mkdir(parents=True)
        for i in range(len(aud["captions"])):
            np.save(d / f"{i}.npy",
                    rng.normal(size=(TINY_EMB,)).astype(np.float32))
    return root


def _shrink(conf: dict, root, outputpath: str) -> dict:
    """Point a zoo config at the synthetic workspace and toy dimensions,
    leaving its structure (model family, schedule keys) untouched."""
    conf.update(h5_csv=str(root / "mels.csv"),
                caption_file=str(root / "text.json"),
                vocab_file=str(root / "vocab.pkl"),
                outputpath=outputpath, epochs=1, batch_size=8,
                train_percent=80, scheduler="constant", scheduler_args={})
    ea = conf.setdefault("encoder_args", {})
    ea.update(embed_size=16, channels=[4, 8, 8, 16])
    ea.pop("dtype", None)  # CPU test: skip bf16 convs
    da = conf.setdefault("decoder_args", {})
    da["embed_size"] = 16
    if "nlayers" in da:  # transformer decoders
        da.update(nlayers=1, hidden_size=32)
    elif "hidden_size" in da:
        da["hidden_size"] = 16
    ma = conf.get("model_args", {})
    for k in ("posterior_args", "prior_args"):
        if k in ma:
            ma[k]["hidden_size"] = 16
    if "gmm_kernel" in ma.get("prior_args", {}):
        ma["prior_args"]["gmm_kernel"] = 2
    if ma.get("seq_output_size"):
        ma["seq_output_size"] = TINY_EMB
    if "embedding_path" in conf:
        conf["embedding_path"] = str(root / "emb")
    if "discriminator_args" in conf:
        conf["discriminator_args"] = {"embed_size": 8}
    return conf


@pytest.mark.parametrize(
    "cfg_path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))),
    ids=lambda p: os.path.basename(p))
def test_config_trains(cfg_path, zoo_workspace, tmp_path):
    with open(cfg_path) as f:
        conf = yaml.safe_load(f)
    conf = _shrink(conf, zoo_workspace, str(tmp_path / "experiments"))

    small = tmp_path / "config.yaml"
    if os.path.basename(cfg_path) == "adverse.yaml":
        # the two-stage recipe the file documents: discriminator first,
        # then the captioner with adverse_loss pointed at it
        stage1 = dict(conf)
        stage1.pop("adverse_loss")
        with open(small, "w") as f:
            yaml.safe_dump(stage1, f)
        dsc_dir = Runner().train_discriminator(str(small), mode="aud2cap")
        conf["adverse_loss"]["discriminator"] = dsc_dir

    with open(small, "w") as f:
        yaml.safe_dump(conf, f)
    exp_dir = Runner().train(str(small), seed=5)
    rec = json.loads(
        open(os.path.join(exp_dir, "metrics.jsonl")).readlines()[-1])
    assert np.isfinite(rec["train_loss"]), os.path.basename(cfg_path)
    assert np.isfinite(rec["val_cider"]), os.path.basename(cfg_path)
