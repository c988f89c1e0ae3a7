"""Batch wrapper over ``cli diagnose`` for multiple seed checkpoints.

The core lives in ``acvae_tpu/train/diagnose.py`` (also exposed as
``python -m acvae_tpu.cli diagnose <exp_dir>``); this tool fans it over
several experiment dirs and collects one JSON list — the round-4 rich25
bimodality forensics (RESULTS "Round 4: diagnosing the rich25
bimodality"; raw output archived at artifacts/round4/basins.json).

Usage (from repo root, CPU is fine):
  JAX_PLATFORMS=cpu python tools/diagnose_basins.py \
      /tmp/rich_exp/Hybrid_VAEModel/rich25_0.5_0.5/seed_1 [seed_2 ...] \
      [--batches 6] [--json /tmp/basins.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dirs", nargs="+")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    from acvae_tpu.train.diagnose import diagnose_experiment
    results = []
    for d in args.exp_dirs:
        r = diagnose_experiment(d, batches=args.batches,
                                batch_size=args.batch_size,
                                checkpoint=args.checkpoint)
        results.append(r)
        print(json.dumps(r))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
