"""Summarize the round-4 chip campaign outputs (pure host-side).

Reads whatever /tmp artifacts exist — reverify scores, the int8 stagewise
probe JSON, the warm-restart extension seeds, the mitigation arms, the
TransVAE ablation — and prints one markdown block ready for RESULTS.md.
Safe to run at any point mid-campaign; missing stages are listed as
pending.

Usage: python tools/r4_report.py
"""
from __future__ import annotations

import json
import re
from pathlib import Path

RICH = Path("/tmp/rich_exp")


def cider_from_scores(path: Path):
    if not path.exists():
        return None
    m = re.search(r"CIDEr[^0-9]*([0-9.]+)", path.read_text())
    return float(m.group(1)) if m else None


def traj(exp: Path, k: int = 30):
    p = exp / "metrics.jsonl"
    if not p.exists():
        return None
    recs = [json.loads(l) for l in p.open()]
    return recs[-k:]


def fmt_traj(recs):
    return " ".join(f"{r['epoch']}:{r['val_cider']:.3f}" for r in recs)


def main():
    out = ["## Round-4 campaign summary (auto-generated, tools/r4_report.py)",
           ""]

    # stage 0: reverify
    s3 = RICH / "Hybrid_VAEModel/rich25_0.5_0.5/seed_3"
    c = cider_from_scores(s3 / "scores_beam_3_reverify.txt")
    out.append(f"* seed-3 capstone re-verify (held-out beam-3): "
               f"{'CIDEr %.3f' % c if c is not None else 'PENDING'} "
               f"(round-3 reading: 0.780)")

    # stage 0c: v4 accuracy
    c4 = None
    for p in s3.glob("scores_beam_3_*int8v4*.txt"):
        c4 = cider_from_scores(p)
    out.append(f"* int8 v4 accuracy on seed 3: "
               f"{'CIDEr %.3f' % c4 if c4 is not None else 'PENDING'}")

    # stage 0b: int8 probe
    probe = Path("/tmp/r4_int8stem.log")
    if probe.exists():
        txt = probe.read_text()
        i = txt.rfind('{\n "batch"')
        if i >= 0:
            try:
                j = json.loads(txt[i:])
                out.append(f"* int8 stagewise probe: best_ms={j['best_ms']} "
                           f"int8_vs_bf16={j['int8_vs_bf16']}x "
                           f"stage_deltas={j['stage_deltas_ms']}")
            except Exception:
                out.append("* int8 probe: log present, JSON unparsed")
        else:
            out.append("* int8 probe: log present, JSON missing (see log)")
    else:
        out.append("* int8 stagewise probe: PENDING")

    # extension seeds
    for s in (1, 2):
        exp = RICH / f"Hybrid_VAEModel/rich25ext_0.5_0.5/seed_{s}"
        recs = traj(exp)
        c = cider_from_scores(exp / "scores_beam_3_test25.txt")
        if recs is None:
            out.append(f"* ext seed {s} (warm-restart, epochs 26-35, "
                       f"lr floor 1e-5): PENDING")
        else:
            ext = [r for r in recs if r["epoch"] > 25]
            out.append(
                f"* ext seed {s}: val {fmt_traj(ext) or '(no new epochs)'}"
                + (f"; held-out CIDEr {c:.3f}" if c is not None else
                   "; held-out PENDING"))

    # mitigation arms
    for tag, label in (("lr", "arm1 lr-floor"), ("fb", "arm2 free-bits")):
        for s in (4, 5, 6):
            exp = RICH / f"Hybrid_VAEModel/rich25{tag}_0.5_0.5/seed_{s}"
            recs = traj(exp)
            c = cider_from_scores(exp / "scores_beam_3_test25.txt")
            if recs is None:
                out.append(f"* {label} seed {s}: PENDING")
            else:
                peak = max(r["val_cider"] for r in recs)
                au = recs[-1].get("active_units")
                out.append(
                    f"* {label} seed {s}: val peak {peak:.3f}, last-epoch "
                    f"active_units={au}"
                    + (f", held-out CIDEr {c:.3f}" if c is not None
                       else ", held-out PENDING"))

    # TransVAE ablation
    for tag, label in (("tvfr0", "dis-ratio frozen 0"),
                       ("tvfr01", "dis-ratio capped 0.1")):
        hits = list(RICH.glob(f"TransVAEModel/rich25{tag}_*/seed_1"))
        if not hits:
            out.append(f"* TransVAE {label}: PENDING")
            continue
        exp = hits[0]
        recs = traj(exp)
        c = cider_from_scores(exp / "scores_beam_3_test25.txt")
        peak = max(r["val_cider"] for r in recs) if recs else None
        out.append(
            f"* TransVAE {label}: val peak "
            f"{'%.3f' % peak if peak is not None else '?'}"
            + (f", held-out CIDEr {c:.3f}" if c is not None
               else ", held-out PENDING")
            + " (r3 baseline: val peak 0.265 @ epoch 6, held-out 0.192)")
        cd = cider_from_scores(exp / "scores_dbs_8_dbs_g8.txt")
        if cd is not None:
            out.append(f"* TransVAE DBS g8 ({label}): held-out CIDEr {cd:.3f}")

    print("\n".join(out))


if __name__ == "__main__":
    main()
