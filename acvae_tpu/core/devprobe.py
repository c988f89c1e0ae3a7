"""Bounded device-health probe (shared by ``cli doctor`` and ``bench.py``).

The tunneled axon TPU runtime on this image occasionally wedges so that
EVERY in-process device call hangs — including ``jax.devices()`` from a
fresh interpreter.  The only safe probe is a tiny matmul in a *subprocess
with a timeout*; this module is the single implementation so the
config-route ``JAX_PLATFORMS`` workaround and the timing details cannot
drift between consumers.
"""
from __future__ import annotations

import json
import subprocess
import sys
from typing import Any, Dict

# the axon TPU plugin ignores the raw JAX_PLATFORMS env var; the probe
# re-applies it via the config route exactly like cli.main() does
_PROBE = (
    "import os, time, jax, numpy as np\n"
    "if os.environ.get('JAX_PLATFORMS'):\n"
    "    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])\n"
    "t0 = time.perf_counter()\n"
    "x = jax.numpy.ones((128, 128))\n"
    "np.asarray(x @ x)\n"
    "t1 = time.perf_counter()\n"
    "ts = []\n"
    "for _ in range(5):\n"
    "    t = time.perf_counter()\n"
    "    np.asarray(x @ x)\n"
    "    ts.append(time.perf_counter() - t)\n"
    "import json\n"
    "print(json.dumps({'devices': [str(d) for d in jax.devices()],"
    " 'platform': jax.default_backend(),"
    " 'first_call_s': round(t1 - t0, 3),"
    " 'dispatch_ms_p50': round(sorted(ts)[2] * 1000, 2)}))\n")


def backend_initialized() -> bool:
    """True iff some jax backend is already live in this process — a
    *read-only* check (never initializes anything).  The decisive gate for
    every platform question: post-init, ``jax.default_backend()`` is the
    truth and safe to call; pre-init, config updates still control which
    platform the first dispatch will hit.  When the private API is missing
    (future jax), claim initialized — callers then consult the live backend,
    which is always correct (merely forfeiting a pre-init fast path)."""
    try:
        from jax._src import xla_bridge
        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        return True


def apply_jax_platforms_env(label: str = "devprobe") -> bool:
    """Apply the ``JAX_PLATFORMS`` env var via the config route (the axon
    TPU plugin ignores the raw env var).  The single implementation for
    every consumer (``cli.main``, ``__graft_entry__``; the probe snippet
    inlines the same two lines as a string).  Returns True when the config
    route *controls* the platform — i.e. the env var was applied before any
    backend initialized (or no env var is set, leaving the default in
    force).  Returns False when a backend was already live: on this jax,
    ``jax.config.update('jax_platforms', ...)`` does NOT raise post-init —
    it silently no-ops on the live backend (measured; CLAUDE.md) — so the
    update's success proves nothing and the pre-update
    ``backend_initialized()`` check below is the only honest signal.  The
    caller must then gate on ``jax.default_backend()``."""
    import os

    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return True
    if backend_initialized():
        print(f"[{label}] JAX_PLATFORMS={want} ignored: a backend is "
              f"already initialized (live: {jax.default_backend()})",
              file=sys.stderr)
        return False
    jax.config.update("jax_platforms", want)
    return True


#: cmdline substrings that mark a process as a likely chip occupant.
#: Read-only /proc inspection — used to label a probe timeout as
#: contention instead of a wedge (measured round 4: bench.py dispatched
#: fine at 01:07 while doctor's bounded probe "failed" at 01:04/01:17 —
#: the probe starved behind bench, the tunnel was alive).
_CHIP_WORK_MARKERS = ("cli train", "cli evaluate", "cli scst",
                      "cli predict", "cli stage1", "cli global_vae",
                      "probe_int8", "probe_decode", "probe_upload",
                      "serve_bench", "bench.py")


def concurrent_chip_users() -> list:
    """Other live processes on this host whose cmdline looks like chip
    work (training/eval/bench).  Pure /proc read — never signals anything.
    Returns short ``pid:marker`` strings for the probe/doctor report."""
    import os

    out = []
    me = os.getpid()
    try:
        pids = [p for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return out
    for p in pids:
        if int(p) == me:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        for m in _CHIP_WORK_MARKERS:
            if m in cmd:
                out.append(f"{p}:{m}")
                break
    return out


def probe_device(timeout: float = 120.0,
                 ignore_platform_env: bool = False) -> Dict[str, Any]:
    """One bounded probe.  Returns ``{"ok": True, "device": {...}}`` on a
    healthy device, ``{"ok": False, "error": ...}`` on failure or timeout —
    never hangs longer than ``timeout`` seconds.

    ``ignore_platform_env`` drops ``JAX_PLATFORMS`` from the subprocess env
    so the probe tests the *default* platform — for callers whose own
    backend was initialized before the env var could be applied (the probe
    must agree with what the caller's dispatches actually hit)."""
    env = None
    if ignore_platform_env:
        import os
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        users = concurrent_chip_users()
        if users:
            return {"ok": False, "busy": users,
                    "error": f"device probe hung for {timeout:.0f}s while "
                             f"other work holds the chip ({'; '.join(users)})"
                             f" — likely CONTENTION, not a wedge: the single"
                             f" tunneled chip serializes callers and a "
                             f"bounded probe starves behind heavy dispatch. "
                             f"Re-probe when that work finishes"}
        return {"ok": False,
                "error": f"device probe hung for {timeout:.0f}s — the "
                         f"tunneled runtime is likely wedged; known to "
                         f"recover in ~45 min to 3+ h"}
    if r.returncode != 0:
        lines = (r.stderr or "").splitlines()
        err = lines[-1] if lines else f"probe exited {r.returncode} with no stderr"
        return {"ok": False, "error": err}
    # scan stdout bottom-up for the status JSON: plugin/log noise around it
    # (or empty stdout on an rc-0 exit) must still honor the ok:False
    # contract instead of raising IndexError/JSONDecodeError
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return {"ok": True, "device": json.loads(line)}
            except json.JSONDecodeError:
                continue
    return {"ok": False,
            "error": "probe exited 0 but printed no parseable status; "
                     f"stdout tail: {r.stdout[-200:]!r}"}


def wait_for_device(deadline_s: float, label: str = "device",
                    ignore_platform_env: bool = False,
                    busy_deadline_s: float = None) -> bool:
    """Probe-with-retry until the device answers or ``deadline_s`` passes.

    Shared shield for anything whose FIRST dispatch would otherwise hang
    unboundedly on a wedged tunnel (``bench.py``, the driver's
    ``__graft_entry__.entry()`` compile check).  Returns True when the
    device answered, False when the deadline passed (callers proceed anyway
    and let their own/outer timeout decide, having logged the wedge).
    On a healthy device the first probe returns in seconds.

    When the probe reports CONTENTION (another train/eval/bench process
    holds the single serialized chip — ``busy``), the wait is allowed to
    run past ``deadline_s`` up to ``busy_deadline_s`` (default
    ``max(deadline_s, 2700)``): contention resolves when the occupant
    finishes, and a bench that "proceeds anyway" into a busy chip records
    a drift-poisoned headline (the round-4 BENCH lesson) — waiting for a
    clean chip is strictly better than measuring through someone else's
    dispatch stream."""
    import time

    if busy_deadline_s is None:
        busy_deadline_s = max(float(deadline_s), 2700.0)
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        r = probe_device(timeout=120,
                         ignore_platform_env=ignore_platform_env)
        if r["ok"]:
            if attempt > 1:
                print(f"# {label} recovered after {time.time() - t0:.0f}s "
                      f"({attempt} probes)", file=sys.stderr)
            return True
        waited = time.time() - t0
        busy = r.get("busy")
        limit = busy_deadline_s if busy else deadline_s
        if waited >= limit:
            why = (f"chip busy ({'; '.join(busy)})" if busy
                   else "tunnel wedged?")
            print(f"# WARNING: {label} probe failed for {waited:.0f}s "
                  f"({why}) — proceeding anyway", file=sys.stderr)
            return False
        state = (f"chip busy: {'; '.join(busy)}" if busy else "no answer")
        print(f"# {label} probe {attempt} failed ({waited:.0f}s elapsed; "
              f"{state}); retrying", file=sys.stderr)
        time.sleep(min(60, max(5, limit - waited)))
