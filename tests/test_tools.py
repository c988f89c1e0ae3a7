"""Keep tools/probe_decode.py importable and its cheap probes runnable —
the on-chip measurement harness must not bit-rot between perf campaigns."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_slope_probes_run_on_cpu():
    env = dict(os.environ, PROBE_N="2", PROBE_E="16", PROBE_V="37",
               PROBE_T_MEL="64", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys;"
         "sys.argv = ['tools/probe_decode.py', 'slope', 'gather'];"
         "runpy.run_path('tools/probe_decode.py', run_name='__main__')"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    assert "beam gather" in r.stdout
