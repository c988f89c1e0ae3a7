"""Summarize the round-5 chip campaign (pure host-side).

Round 5 harvests the round-4 campaign (which never ran — tunnel wedged
end-to-end, RESULTS "Round 4 campaign outcome") and adds the sweep-driven
mitigation arms (`cli sweep --assessor=median`, /tmp/r5_arm_sweeps.sh).
Reads whatever /tmp artifacts exist and prints one markdown block ready
for RESULTS.md; missing stages are listed as pending.  Stage outputs are
recognized from BOTH the r4 layout (rich25lr/rich25fb hand-launched arms)
and the r5 layout (swlr/swfb sweep-trial dirs), whichever ran.

Usage: python tools/r5_report.py
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


def traj(exp: Path, k: int = 40):
    p = exp / "metrics.jsonl"
    if not p.exists():
        return None
    recs = [json.loads(l) for l in p.open()]
    return recs[-k:]


def fmt_traj(recs):
    return " ".join(f"{r['epoch']}:{r['val_cider']:.3f}" for r in recs)


def arm_dirs(tag_r4: str, tag_r5: str, seed: int):
    """Either arm layout for one seed: r4 hand-launched or r5 sweep."""
    cands = [RICH / f"Hybrid_VAEModel/rich25{tag_r4}_0.5_0.5/seed_{seed}",
             RICH / f"Hybrid_VAEModel/{tag_r5}_0.5_0.5/seed_{seed}"]
    return next((c for c in cands if c.exists()), None)


def main():
    out = ["## Round-5 campaign summary (auto-generated, tools/r5_report.py)",
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

    # stage 0b: int8 probe (r4 or r5 log)
    done = False
    for probe in (Path("/tmp/r4_int8stem.log"), Path("/tmp/r5_int8stem.log")):
        if not probe.exists():
            continue
        txt = probe.read_text()
        i = txt.rfind('{\n "batch"')
        if i >= 0:
            try:
                j = json.loads(txt[i:])
                out.append(f"* int8 stagewise probe ({probe.name}): "
                           f"best_ms={j['best_ms']} "
                           f"int8_vs_bf16={j['int8_vs_bf16']}x "
                           f"stage_deltas={j['stage_deltas_ms']}")
                done = True
            except Exception:
                pass
    if not done:
        out.append("* int8 stagewise probe: PENDING")

    # extension seeds (warm restart causal test)
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

    # mitigation arms — r4 hand-launched OR r5 sweep layout
    for tag4, tag5, label in (("lr", "swlr", "arm1 lr-floor"),
                              ("fb", "swfb", "arm2 free-bits")):
        for s in (4, 5, 6):
            exp = arm_dirs(tag4, tag5, s)
            recs = traj(exp) if exp else None
            if recs is None:
                out.append(f"* {label} seed {s}: PENDING")
                continue
            c = cider_from_scores(exp / "scores_beam_3_test25.txt")
            peak = max(r["val_cider"] for r in recs)
            au = recs[-1].get("active_units")
            n_ep = recs[-1]["epoch"]
            out.append(
                f"* {label} seed {s} [{exp.parent.name}]: val peak "
                f"{peak:.3f} ({n_ep} epochs), last active_units={au}"
                + (f", held-out CIDEr {c:.3f}" if c is not None
                   else ", held-out PENDING"))

    # sweep-surface evidence (VERDICT r4 task 7)
    for arm, logp in (("arm1", Path("/tmp/r5_sweep_arm1.log")),
                      ("arm2", Path("/tmp/r5_sweep_arm2.log"))):
        if logp.exists():
            txt = logp.read_text()
            stops = txt.count("stopped early")
            out.append(f"* {arm} sweep log: {stops} median-stopped trial(s)"
                       f" ({logp})")
        else:
            out.append(f"* {arm} sweep log: PENDING")

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
