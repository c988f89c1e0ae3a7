"""Serving load benchmark: drive the HTTP caption service end-to-end.

Measures what a deployment actually sees — client-observed latency
percentiles and sustained captions/s through `acvae_tpu.serve.run_server`'s
micro-batching HTTP path (reference has no serving story at all; the
framework's is serve.py) — at several closed-loop concurrency levels.

Usage (real chip; ~2-4 min total):

    python tools/serve_bench.py /tmp/rich_exp/Hybrid_VAEModel/rich_0.5_0.5/seed_1 \
        [--levels=1,8,32,64] [--seconds=20] [--batch_size=16] \
        [--mel_frames=1024] [--encoder_int8] [--uint8] [--port=8077]

``--uint8`` posts client-quantized codes (X-Mel-Dtype: uint8 — 1/4 the
upload bytes, dequantized on device); the client-side quantize runs inside
the timed loop, as a real client's would.

Per level it prints client-side p50/p95/p99 latency and throughput, plus
the server's own /stats snapshot deltas (mean micro-batch fill); a final
single JSON line summarizes the best-throughput level.  The binary
octet-stream request path is used (the JSON mel encode costs more host
time than the decode — serve.py do_POST).
"""
from __future__ import annotations

import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post_mel(host: str, port: int, mel: np.ndarray, timeout: float = 120.0,
              uint8: bool = False):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        headers = {
            "Content-Type": "application/octet-stream",
            "X-Mel-Frames": str(mel.shape[0]),
            "X-Mel-Bins": str(mel.shape[1]),
        }
        if uint8:
            # client-side quantization (the --uint8 A/B): 1/4 the upload
            # bytes, dequantized on device (docs/serving.md)
            lo, hi = float(mel.min()), float(mel.max())
            scale = (hi - lo) / 255.0 or 1.0
            body = np.clip(np.round((mel - lo) / scale), 0,
                           255).astype(np.uint8).tobytes()
            headers.update({"X-Mel-Dtype": "uint8",
                            "X-Mel-Scale": str(scale),
                            "X-Mel-Offset": str(lo)})
        else:
            body = mel.astype("<f4").tobytes()
        conn.request("POST", "/caption", body=body, headers=headers)
        r = conn.getresponse()
        raw = r.read()
        if r.status != 200:
            # error replies may be HTML (BaseHTTPRequestHandler.send_error)
            raise RuntimeError(f"HTTP {r.status}: {raw[:200]!r}")
        return json.loads(raw)
    finally:
        conn.close()


def _get(host: str, port: int, path: str):
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.request("GET", path)
        return json.loads(conn.getresponse().read())
    finally:
        conn.close()


def run_level(host: str, port: int, mels, concurrency: int,
              seconds: float, uint8: bool = False) -> dict:
    """Closed-loop load: `concurrency` client threads each posting
    back-to-back requests for `seconds`.  Returns client-side stats."""
    stop = time.monotonic() + seconds
    lat: list = []
    errors = [0]
    lock = threading.Lock()

    def client(i: int):
        rng = np.random.default_rng(i)
        while time.monotonic() < stop:
            mel = mels[rng.integers(len(mels))]
            t0 = time.monotonic()
            try:
                _post_mel(host, port, mel, uint8=uint8)
            except Exception:
                with lock:
                    errors[0] += 1
                continue
            with lock:
                lat.append(time.monotonic() - t0)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(concurrency)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    lat.sort()

    def pct(p):
        # nearest-rank (matches serve.py /stats): floor-indexing reports the
        # max for every n < 20 at p95
        return float(np.percentile(lat, p * 100)) * 1000 if lat else None

    return {
        "concurrency": concurrency,
        "requests": len(lat),
        "errors": errors[0],
        "captions_per_sec": round(len(lat) / wall, 1),
        "latency_ms_p50": round(pct(0.50), 1) if lat else None,
        "latency_ms_p95": round(pct(0.95), 1) if lat else None,
        "latency_ms_p99": round(pct(0.99), 1) if lat else None,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), "1")
                for a in sys.argv[1:] if a.startswith("--"))
    if not args:
        print(__doc__)
        sys.exit(2)
    exp = args[0]
    levels = [int(x) for x in opts.get("levels", "1,8,32,64").split(",")]
    seconds = float(opts.get("seconds", 20))
    port = int(opts.get("port", 8077))
    batch_size = int(opts.get("batch_size", 16))
    mel_frames = int(opts.get("mel_frames", 1024))
    host = "127.0.0.1"

    from acvae_tpu.serve import CaptionService, run_server

    svc = CaptionService(
        exp, batch_size=batch_size, mel_bucket=mel_frames,
        encoder_int8=bool(int(opts.get("encoder_int8", "0"))),
        upload_dtype=opts.get("upload_dtype", "float32"),
        decode_dtype=opts.get("decode_dtype") or None)
    server_thread = threading.Thread(
        target=run_server, args=(svc,), kwargs={"host": host, "port": port},
        daemon=True)
    server_thread.start()
    for _ in range(100):
        try:
            if _get(host, port, "/health")["status"] == "ok":
                break
        except Exception:
            time.sleep(0.2)
    else:
        raise RuntimeError("server never became healthy")

    rng = np.random.default_rng(0)
    mels = [rng.normal(size=(mel_frames, svc.data_dim)).astype(np.float32) * 2
            for _ in range(8)]
    uint8_payload = bool(int(opts.get("uint8", "0")))
    _post_mel(host, port, mels[0], uint8=uint8_payload)  # warm the program shape

    rows = []
    for c in levels:
        before = _get(host, port, "/stats")
        r = run_level(host, port, mels, c, seconds,
                      uint8=uint8_payload)
        after = _get(host, port, "/stats")
        db = after["batches"] - before["batches"]
        dr = after["batched_requests"] - before["batched_requests"]
        r["mean_batch_fill"] = round(dr / db, 2) if db else None
        rows.append(r)

        def ms(v):  # a zero-success level has no percentiles
            return f"{v:>7.1f}" if v is not None else "      —"
        print(f"# c={c:<3d} {r['captions_per_sec']:>7.1f} cap/s  "
              f"p50 {ms(r['latency_ms_p50'])} ms  "
              f"p95 {ms(r['latency_ms_p95'])} ms  "
              f"p99 {ms(r['latency_ms_p99'])} ms  "
              f"fill {r['mean_batch_fill']}  errors {r['errors']}",
              file=sys.stderr, flush=True)

    best = max(rows, key=lambda r: r["captions_per_sec"])
    print(json.dumps({"metric": "serving_captions_per_sec",
                      "value": best["captions_per_sec"],
                      "unit": "captions/s",
                      "at_concurrency": best["concurrency"],
                      "latency_ms_p50": best["latency_ms_p50"],
                      "latency_ms_p95": best["latency_ms_p95"],
                      "levels": rows}), flush=True)


if __name__ == "__main__":
    main()
