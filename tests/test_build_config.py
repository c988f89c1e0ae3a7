"""Regression tests for bugs found driving the CLI end-to-end.

1. Encoder/decoder embed-size mismatch: every model family adapts the encoder
   memory with the ``ln`` Dense (the reference's ``self.ln``,
   vae_model.py:30-32), so the factory must size the decoder's ``enc_mem_size``
   by the *decoder* embed dim, not the raw encoder dim.
2. YAML 1.1 scientific notation: pyyaml parses ``1e-3`` as a string; the
   config loader coerces bare scientific-notation scalars to float so
   ``lr: 1e-3`` works like every YAML-1.2 reader expects.
"""
import jax
import jax.numpy as jnp
import numpy as np

from acvae_tpu.core.config import load_config
from acvae_tpu.models.build import build_model


def test_mismatched_encoder_decoder_dims(rng):
    cfg = {
        "model": "Hybrid_VAEModel",
        "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": 16, "channels": [4, 8, 8, 16]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": 8, "hidden_size": 8},
        "model_args": {
            "posterior_model": "PosteriorRNN_hybrid",
            "posterior_args": {"hidden_size": 8},
            "prior_model": "PriorRNN",
            "prior_args": {"hidden_size": 8},
        },
    }
    model = build_model(cfg, vocab_size=23, data_dim=64)
    feats = jnp.asarray(rng.normal(size=(2, 64, 64)).astype(np.float32))
    feat_lens = jnp.array([64, 48])
    caps = jnp.ones((2, 10), jnp.int32)
    cap_lens = jnp.array([10, 7])
    v = model.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                   feats, feat_lens, caps, cap_lens, train=False)
    out, _ = model.apply(v, feats, feat_lens, caps, cap_lens, train=True,
                         ss_ratio=1.0, dis_ratio=0.0,
                         rngs={"sample": jax.random.key(2),
                               "dropout": jax.random.key(3)},
                         mutable=["batch_stats"])
    assert out["logits"].shape == (2, 9, 23)
    # the adapter exists and the decoder sees 8-dim memory
    assert "ln" in v["params"]


def test_yaml11_scientific_notation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("optimizer_args:\n  lr: 1e-3\n"
                 "beta: 5E4\nremark: exp_1e\nvalues: [1e-2, two]\n")
    cfg = load_config(str(p))
    assert cfg["optimizer_args"]["lr"] == 1e-3
    assert cfg["beta"] == 5e4
    assert cfg["remark"] == "exp_1e"        # not bare sci-notation: untouched
    assert cfg["values"] == [1e-2, "two"]
    # CLI overrides too
    cfg = load_config(str(p), **{"optimizer_args.lr": "2e-4"})
    assert cfg["optimizer_args"]["lr"] == 2e-4


def test_config_nested_attribute_writes_persist():
    """Config.__getattr__ must return a LIVE view: writes through nested
    attribute access (the tuning path sweep/NNI-style code uses) must land
    in the underlying config, not a throwaway copy."""
    from acvae_tpu.core.config import Config
    cfg = Config({"model_args": {"beta": 1.0, "inner": {"k": 1}}})
    cfg.model_args.beta = 0.5
    assert cfg["model_args"]["beta"] == 0.5
    cfg.model_args["beta"] = 0.25
    assert cfg["model_args"]["beta"] == 0.25
    cfg.model_args.update({"beta": 9})
    assert cfg["model_args"]["beta"] == 9
    cfg.model_args.inner.k = 2
    assert cfg["model_args"]["inner"]["k"] == 2


def test_registry_duplicate_alias_registers_nothing():
    """A duplicate alias must not leave the primary name half-registered."""
    import pytest

    from acvae_tpu.core.registry import Registry
    r = Registry("thing")
    r.register("a")(lambda: "a")
    with pytest.raises(KeyError):
        r.register("b", aliases=("a",))(lambda: "b")
    assert "b" not in r
    # a corrected re-registration of "b" now succeeds
    r.register("b")(lambda: "b2")
    assert r.build("b") == "b2"


def test_probe_device_tolerates_rc0_noise(monkeypatch):
    """An rc-0 probe whose stdout has log noise around (or instead of) the
    status JSON must honor the ok-contract, never traceback."""
    import subprocess

    from acvae_tpu.core import devprobe

    def fake_run(stdout):
        def run(*a, **kw):
            return subprocess.CompletedProcess(a, 0, stdout=stdout, stderr="")
        return run

    monkeypatch.setattr(devprobe.subprocess, "run",
                        fake_run('{"platform": "cpu"}\nplugin shutdown noise\n'))
    out = devprobe.probe_device(timeout=5)
    assert out["ok"] and out["device"]["platform"] == "cpu"

    monkeypatch.setattr(devprobe.subprocess, "run", fake_run(""))
    out = devprobe.probe_device(timeout=5)
    assert out["ok"] is False and "no parseable status" in out["error"]


def test_probe_timeout_labels_contention_vs_wedge(monkeypatch):
    """A probe timeout while another process holds the chip is reported as
    CONTENTION (busy list attached), not a wedge — measured round 4:
    bench.py dispatched fine while doctor's bounded probe starved behind
    it (RESULTS 'Round 4 campaign outcome')."""
    import subprocess

    from acvae_tpu.core import devprobe

    def raise_timeout(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=5)

    monkeypatch.setattr(devprobe.subprocess, "run", raise_timeout)
    monkeypatch.setattr(devprobe, "concurrent_chip_users",
                        lambda: ["123:cli train"])
    out = devprobe.probe_device(timeout=5)
    assert out["ok"] is False
    assert out["busy"] == ["123:cli train"]
    assert "CONTENTION" in out["error"]

    monkeypatch.setattr(devprobe, "concurrent_chip_users", lambda: [])
    out = devprobe.probe_device(timeout=5)
    assert out["ok"] is False and "busy" not in out
    assert "wedged" in out["error"]


def test_wait_for_device_busy_extends_past_wedge_deadline(monkeypatch):
    """Contention (busy probe) must extend the wait past the wedge
    deadline up to busy_deadline_s — a bench that proceeds into a busy
    chip records a drift-poisoned headline (round-4 BENCH lesson).  A
    wedge (no busy list) must still give up at deadline_s."""
    import time as _time

    from acvae_tpu.core import devprobe

    clock = {"t": 0.0}
    monkeypatch.setattr(devprobe, "probe_device",
                        lambda **kw: {"ok": False, "busy": ["9:cli train"],
                                      "error": "contention"})
    monkeypatch.setattr(_time, "time", lambda: clock["t"])

    def sleep(s):
        clock["t"] += max(s, 1)

    monkeypatch.setattr(_time, "sleep", sleep)
    # wedge deadline 10 s, busy deadline 100 s: busy probes keep retrying
    # past 10 s and give up only at the busy deadline
    assert devprobe.wait_for_device(10, busy_deadline_s=100) is False
    assert clock["t"] >= 100

    # recovery mid-wait: device answers once the occupant finishes
    clock["t"] = 0.0
    calls = {"n": 0}

    def probe_then_ok(**kw):
        calls["n"] += 1
        if clock["t"] < 30:
            return {"ok": False, "busy": ["9:cli train"], "error": "c"}
        return {"ok": True, "device": {}}

    monkeypatch.setattr(devprobe, "probe_device", probe_then_ok)
    assert devprobe.wait_for_device(10, busy_deadline_s=100) is True
    assert calls["n"] > 1

    # a pure wedge (no busy list) still gives up at the wedge deadline
    clock["t"] = 0.0
    monkeypatch.setattr(devprobe, "probe_device",
                        lambda **kw: {"ok": False, "error": "wedged"})
    assert devprobe.wait_for_device(10, busy_deadline_s=100) is False
    assert clock["t"] < 100


def test_concurrent_chip_users_reads_proc(monkeypatch):
    """Pure /proc read: returns [] or pid:marker strings, never raises,
    and never includes this process."""
    import os

    from acvae_tpu.core import devprobe

    users = devprobe.concurrent_chip_users()
    assert isinstance(users, list)
    assert all(":" in u for u in users)
    assert not any(u.startswith(f"{os.getpid()}:") for u in users)


def test_apply_jax_platforms_env_post_init_is_honest(monkeypatch):
    """Post-init, ``jax.config.update('jax_platforms', ...)`` silently
    no-ops on the live backend (measured on this jax; CLAUDE.md), so the
    update's success proves nothing — the helper must report False whenever
    a backend was already initialized, or callers skip their hang shields
    believing they are CPU-forced while dispatching at the live backend."""
    import jax
    import numpy as np

    from acvae_tpu.core import devprobe

    np.asarray(jax.numpy.zeros(()))  # force backend init (CPU under tests)
    assert devprobe.backend_initialized()

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert devprobe.apply_jax_platforms_env(label="test") is False

    # no env var -> nothing to apply -> the default stays in force: True
    monkeypatch.delenv("JAX_PLATFORMS")
    assert devprobe.apply_jax_platforms_env(label="test") is True
