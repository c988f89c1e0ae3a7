"""Continuous tunnel-liveness log (RESULTS "Round 4 campaign outcome"
mitigation): append one compact JSON line per `cli doctor` probe to
/tmp/r5_probe_log.jsonl so post-hoc analysis can tell a wedge window from
a flap from chip contention (doctor's `busy` field) — any single bounded
probe is a noisy gate, the *sequence* is the signal.

Runs forever; bound it from the shell:
    nohup python tools/probe_logger.py > /dev/null 2>&1 &
    echo $! > /tmp/probe_logger.pid
Each probe is its own subprocess (no live backend held between probes);
interval 600 s keeps contention with campaign training negligible.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

LOG = Path("/tmp/r5_probe_log.jsonl")
INTERVAL_S = 600
PROBE_TIMEOUT_S = 180


def one_probe() -> dict:
    t0 = time.time()
    rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    try:
        p = subprocess.run(
            [sys.executable, "-m", "acvae_tpu.cli", "doctor"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            cwd=str(Path(__file__).resolve().parents[1]))
        rec["rc"] = p.returncode
        # doctor prints one JSON object; keep only the fields that matter
        try:
            j = json.loads(p.stdout[p.stdout.index("{"):])
            rec["ok"] = j.get("ok")
            rec["busy"] = j.get("busy") or []
            dev = j.get("device") or {}
            rec["dispatch_ms_p50"] = dev.get("dispatch_ms_p50")
            rec["first_call_s"] = dev.get("first_call_s")
        except (ValueError, KeyError):
            rec["stdout_tail"] = p.stdout[-200:]
    except subprocess.TimeoutExpired:
        rec["rc"] = None
        rec["timeout_s"] = PROBE_TIMEOUT_S
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    while True:
        rec = one_probe()
        with LOG.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
