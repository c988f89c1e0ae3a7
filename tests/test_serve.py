"""Serving surface: CaptionService batching + HTTP round trips."""
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """A tiny trained experiment dir (train once, reuse)."""
    import h5py
    import yaml

    from acvae_tpu.cli.main import Runner
    from acvae_tpu.data.synthetic import make_synthetic_clotho

    root = tmp_path_factory.mktemp("serve")
    feats, info, vocab = make_synthetic_clotho(num_audios=6, mel_frames=128)
    h5 = str(root / "m.h5")
    with h5py.File(h5, "w") as f:
        for aid, mel in feats.items():
            f[aid] = mel
    import pandas as pd
    pd.DataFrame({"audio_id": list(feats), "hdf5_path": h5}).to_csv(
        root / "m.csv", sep="\t", index=False)
    (root / "text.json").write_text(json.dumps({"audios": info}))
    vocab.save(str(root / "vocab.pkl"))
    E = 16
    cfg = {
        "model": "VAEModel", "encodermodel": "Cnn10",
        "encoder_args": {"embed_size": E, "channels": [4, 8, 8, E]},
        "decoder": "VAERNNBahdanauAttnDecoder",
        "decoder_args": {"embed_size": E, "hidden_size": E},
        "model_args": {"posterior_model": "PosteriorRNN",
                       "posterior_args": {"hidden_size": E},
                       "prior_model": "PriorRNN",
                       "prior_args": {"hidden_size": E}},
        "h5_csv": str(root / "m.csv"),
        "caption_file": str(root / "text.json"),
        "vocab_file": str(root / "vocab.pkl"),
        "outputpath": str(root / "exp"),
        "epochs": 1, "batch_size": 8, "train_percent": 80,
        "scheduler": "constant", "scheduler_args": {},
    }
    with open(root / "c.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    exp = Runner().train(str(root / "c.yaml"))
    return exp, feats


def test_caption_service_batches(experiment):
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=4, mel_bucket=128, max_length=8,
                        checkpoint="last")
    mels = list(feats.values())[:3]
    captions = svc.caption(mels)
    assert len(captions) == 3
    assert all(isinstance(c, str) for c in captions)
    with pytest.raises(ValueError):
        svc.caption([np.zeros((16, 7), np.float32)])  # wrong mel dim
    with pytest.raises(ValueError):
        svc.caption(list(feats.values())[:5] + mels)  # > batch_size


def test_caption_service_bf16_upload(experiment):
    """upload_dtype=bfloat16 halves the per-batch mel transfer; captions
    stay valid strings (opt-in precision, like --encoder_int8)."""
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last", upload_dtype="bfloat16")
    caps = svc.caption(list(feats.values())[:2])
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    with pytest.raises(ValueError):
        CaptionService(exp, upload_dtype="float16")
    with pytest.raises(ValueError):
        CaptionService(exported="/nonexistent", upload_dtype="bfloat16")


def test_caption_service_from_export(experiment, tmp_path):
    """Serving a jax.export artifact (cli export_model): the service loads
    vocab + decode config from the artifact (no checkpoint/model code),
    captions end-to-end, and is deterministic — a fresh service with the
    same artifact and inputs yields identical captions (the uint32 seed
    counter restarts)."""
    from acvae_tpu.cli.main import Runner
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    out = Runner().export_model(exp, checkpoint="last", t_mel=128,
                                max_length=8,
                                output_dir=str(tmp_path / "export"))
    svc = CaptionService(exp, batch_size=4, exported=out)
    assert svc.bucket == 128 and svc.variables is None
    mels = list(feats.values())[:3]
    caps = svc.caption(mels)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)
    # same artifact, same seed -> identical captions (fresh service resets
    # the seed counter)
    svc2 = CaptionService(exp, batch_size=4, exported=out)
    assert svc2.caption(mels) == caps
    with pytest.raises(ValueError):
        svc.caption([np.zeros((16, 7), np.float32)])  # wrong mel dim


def test_http_server_round_trip(experiment):
    from acvae_tpu.serve import CaptionService, run_server

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                        checkpoint="last")
    server = run_server(svc, port=0, block=False, max_wait_ms=5.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30).read())
        assert health["status"] == "ok"

        mel = next(iter(feats.values()))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption",
            data=json.dumps({"mel": mel.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert isinstance(out["caption"], str)

        # binary fast path: raw float32 + shape headers
        mel32 = np.ascontiguousarray(mel, dtype="<f4")
        breq = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=mel32.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Mel-Frames": str(mel32.shape[0]),
                     "X-Mel-Bins": str(mel32.shape[1])})
        bout = json.loads(urllib.request.urlopen(breq, timeout=120).read())
        # prior-z sampling makes decodes stochastic across calls; just
        # check the binary path produced a caption
        assert isinstance(bout["caption"], str)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption",
            data=json.dumps({"nope": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400

        # operational counters reflect the traffic above
        snap = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert snap["requests"] == 3 and snap["ok"] == 2
        assert snap["client_errors"] == 1 and snap["server_errors"] == 0
        assert snap["batches"] >= 1 and snap["batched_requests"] == 2
        assert snap["latency_ms_p50"] > 0 and snap["uptime_s"] >= 0
    finally:
        server._acvae_stop()
        thread.join(timeout=10)


def test_batcher_drops_abandoned_requests(experiment):
    """A request whose handler already timed out (504 sent, cancelled flag
    set) must not consume a decode slot in a later micro-batch."""
    from acvae_tpu.serve import CaptionService, run_server

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last")
    decoded = []
    real_caption = svc.caption

    def spy(mels):
        decoded.append(len(mels))
        return real_caption(mels)

    svc.caption = spy
    server = run_server(svc, port=0, block=False, max_wait_ms=5.0)
    try:
        q = server._acvae_queue
        mel = next(iter(feats.values()))

        # abandoned request: cancelled pre-set (handler replied 504 already)
        dead_evt, dead_cancel = threading.Event(), threading.Event()
        dead_cancel.set()
        q.put((mel, {}, dead_evt, dead_cancel))

        live_res: dict = {}
        live_evt, live_cancel = threading.Event(), threading.Event()
        q.put((mel, live_res, live_evt, live_cancel))

        assert live_evt.wait(timeout=120.0)
        assert isinstance(live_res["caption"], str)
        assert not dead_evt.is_set()
        # every decoded micro-batch consisted of live requests only
        assert decoded and all(n == 1 for n in decoded)
    finally:
        # serve_forever() was never started here, so server.shutdown()
        # (inside _acvae_stop) would block forever — stop the batcher and
        # close the socket directly
        server._acvae_queue.put(None)
        server.server_close()


def test_quantized_upload_matches_f32(experiment):
    """A client-quantized (uint8, scale, offset) batch uploads codes and
    dequantizes on device; with the same RNG key and mels that ARE the
    dequantized codes, the captions are token-identical to the f32 path
    (the affine is the same IEEE f32 math on host and device).  Mixed
    batches fall back to host dequantization — also identical."""
    import jax
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last")
    mel = next(iter(feats.values())).astype(np.float32)
    lo, hi = float(mel.min()), float(mel.max())
    scale = np.float32((hi - lo) / 255.0 or 1.0)
    offset = np.float32(lo)
    q = np.clip(np.round((mel - offset) / scale), 0, 255).astype(np.uint8)
    deq = q.astype(np.float32) * float(scale) + float(offset)

    svc._key = jax.random.key(99)
    cap_f32 = svc.caption([deq])
    svc._key = jax.random.key(99)
    cap_u8 = svc.caption([(q, float(scale), float(offset))])
    assert cap_u8 == cap_f32
    svc._key = jax.random.key(99)
    cap_mixed = svc.caption([(q, float(scale), float(offset)), deq])
    assert cap_mixed[0] == cap_f32[0]

    with pytest.raises(ValueError):
        svc.validate_q(q, 0.0, 0.0)  # scale must be positive
    with pytest.raises(ValueError):
        svc.validate_q(q[:, :3], 1.0, 0.0)  # wrong mel dim
    with pytest.raises(ValueError):
        svc.validate_q(q.astype(np.int32) + 300, 1.0, 0.0)  # not uint8

    # SHORT clip (T < bucket): the mixed-batch host-dequant fallback must
    # pad in the quantized domain, so the same request captions identically
    # regardless of micro-batch composition (ADVICE r2: the old fallback
    # padded the dequantized f32 with exact 0.0 while the pure-u8 batch
    # padded with the code nearest 0 — conv receptive fields cross the
    # valid boundary despite lens masking)
    short = (q[:17], float(scale), float(offset))
    svc._key = jax.random.key(123)
    cap_short_u8 = svc.caption([short, short])       # pure-u8 device path
    svc._key = jax.random.key(123)
    cap_short_mix = svc.caption([short, deq])        # host-dequant fallback
    assert cap_short_mix[0] == cap_short_u8[0]


def test_http_uint8_binary_path(experiment):
    """X-Mel-Dtype: uint8 + scale/offset headers ships 1/4 the bytes and
    round-trips to a caption; a bad dtype is a 400."""
    from acvae_tpu.serve import CaptionService, run_server

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last")
    server = run_server(svc, port=0, block=False, max_wait_ms=5.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        mel = next(iter(feats.values())).astype(np.float32)
        lo, hi = float(mel.min()), float(mel.max())
        scale = (hi - lo) / 255.0 or 1.0
        q = np.clip(np.round((mel - lo) / scale), 0, 255).astype(np.uint8)
        breq = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=q.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Mel-Frames": str(q.shape[0]),
                     "X-Mel-Bins": str(q.shape[1]),
                     "X-Mel-Dtype": "uint8",
                     "X-Mel-Scale": str(scale),
                     "X-Mel-Offset": str(lo)})
        out = json.loads(urllib.request.urlopen(breq, timeout=120).read())
        assert isinstance(out["caption"], str)

        jreq = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption",
            data=json.dumps({"mel_q8": q.tolist(), "scale": scale,
                             "offset": lo}).encode(),
            headers={"Content-Type": "application/json"})
        jout = json.loads(urllib.request.urlopen(jreq, timeout=120).read())
        assert isinstance(jout["caption"], str)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=q.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Mel-Frames": str(q.shape[0]),
                     "X-Mel-Bins": str(q.shape[1]),
                     "X-Mel-Dtype": "int16"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400

        # mel_q8 without its affine is a 400, not codes-as-mels garbage
        # (ADVICE r2: a defaulted scale=1/offset=0 silently captioned raw
        # 0..255 codes)
        noaffine = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption",
            data=json.dumps({"mel_q8": q.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(noaffine, timeout=30)
        assert e.value.code == 400
    finally:
        server._acvae_stop()
        thread.join(timeout=10)


def test_int8_service_decodes(experiment):
    """encoder_int8: the int8 serving encoder (models/quant.py) produces
    captions through the same service surface."""
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=4, mel_bucket=128, max_length=8,
                         checkpoint="last", encoder_int8=True)
    captions = svc.caption(list(feats.values())[:3])
    assert len(captions) == 3 and all(isinstance(c, str) for c in captions)


def test_serve_dbs_knobs(experiment):
    """DBS decode knobs (group_size etc.) plumb through CaptionService —
    previously only beam_size did, so serve --decode_method=dbs was stuck
    on the (invalid) default group_size."""
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last", decode_method="dbs",
                         beam_size=4, group_size=2, diversity_lambda=1.0)
    mel = next(iter(feats.values())).astype(np.float32)
    caps = svc.caption([mel])
    assert len(caps) == 1 and isinstance(caps[0], str)
    # the invalid default (beam 3 < group 5) keeps failing loudly
    with pytest.raises(ValueError, match="beam_size >= group_size"):
        CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                       checkpoint="last", decode_method="dbs")


def test_cli_serve_forwards_decode_kwargs(experiment, monkeypatch):
    """Runner.serve passes **decode_kwargs through to CaptionService (DBS
    group_size etc. — previously swallowed, so the CLI silently served the
    default group structure) and run_server receives the configured
    service."""
    import acvae_tpu.serve as serve_mod
    from acvae_tpu.cli.main import Runner

    exp, feats = experiment
    captured = {}

    def fake_run_server(service, host="127.0.0.1", port=0, max_wait_ms=0.0):
        captured["service"] = service

    monkeypatch.setattr(serve_mod, "run_server", fake_run_server)
    Runner().serve(exp, checkpoint="last", decode_method="dbs", beam_size=4,
                   mel_bucket=128, max_length=8, batch_size=2,
                   group_size=2, diversity_lambda=1.0)
    svc = captured["service"]
    mel = next(iter(feats.values())).astype(np.float32)
    caps = svc.caption([mel])
    assert len(caps) == 1 and isinstance(caps[0], str)
    # the invalid CLI default (beam 3 < group 5) still fails loudly
    with pytest.raises(ValueError, match="beam_size >= group_size"):
        Runner().serve(exp, checkpoint="last", decode_method="dbs",
                       mel_bucket=128, max_length=8, batch_size=2)


def test_cli_serve_exported_rejects_decode_kwargs(experiment, tmp_path,
                                                  monkeypatch):
    """decode_kwargs are baked into an exported artifact like the named
    decode flags — Runner.serve rejects them instead of dropping them."""
    from acvae_tpu.cli.main import Runner

    exp, feats = experiment
    out = str(tmp_path / "art")
    Runner().export_model(exp, checkpoint="last", output_dir=out, t_mel=128,
                          max_length=8, batch_size=2)
    with pytest.raises(ValueError, match="group_size.*do not apply"):
        Runner().serve(exported=out, batch_size=2, group_size=2)


def test_cli_diagnose_reports_latent_stats(experiment, tmp_path):
    """cli diagnose (train/diagnose.py): offline posterior diagnostics over
    a trained experiment — keys present, finite, active-units bounded by
    the latent width."""
    from acvae_tpu.cli.main import Runner

    exp, feats = experiment
    out = Runner().diagnose(exp, batches=2, batch_size=4,
                            checkpoint="last",
                            output=str(tmp_path / "diag.json"))
    for k in ("kl_total", "active_units_0.01", "qp_mse",
              "ce_posterior_z", "ce_prior_z", "latent_dims"):
        assert k in out, k
    assert 0 <= out["active_units_0.01"] <= out["latent_dims"]
    assert np.isfinite(out["ce_posterior_z"])
    assert np.isfinite(out["ce_prior_z"])
    import json as _json
    assert _json.load(open(tmp_path / "diag.json")) == out


def test_int8_v4_scheme_through_service(experiment):
    """--int8_scheme=v4 (quantized tail) resolves through the serving
    surface and captions."""
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(exp, batch_size=2, mel_bucket=128, max_length=8,
                         checkpoint="last", encoder_int8=True,
                         int8_scheme="v4")
    caps = svc.caption(list(feats.values())[:2])
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_ensemble_serving(experiment):
    """Comma-separated experiment paths serve the prob-averaged ensemble
    as one jitted program (round-4 beyond-parity: the reference's ensemble
    is offline-eval only)."""
    from acvae_tpu.serve import CaptionService

    exp, feats = experiment
    svc = CaptionService(f"{exp},{exp}", batch_size=2, mel_bucket=128,
                         max_length=8, checkpoint="last",
                         decode_method="beam", beam_size=2)
    mels = list(feats.values())[:2]
    caps = svc.caption(mels)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    # the uint8 upload path wraps the same program
    q = (np.clip(mels[0], 0, 1) * 255).astype(np.uint8)
    caps_q = svc.caption([(q, 1.0 / 255.0, 0.0)])
    assert len(caps_q) == 1 and isinstance(caps_q[0], str)
    # invalid compositions fail loudly
    with pytest.raises(ValueError, match="plain f32 decode"):
        CaptionService(f"{exp},{exp}", batch_size=2, mel_bucket=128,
                       checkpoint="last", encoder_int8=True)
    with pytest.raises(ValueError, match="beam|greedy"):
        CaptionService(f"{exp},{exp}", batch_size=2, mel_bucket=128,
                       checkpoint="last", decode_method="sample")
