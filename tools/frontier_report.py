"""Assemble the accuracy<->diversity frontier table from a sweep's outputs.

Reads every ``eval_output_*_<tag>.json`` + ``scores_*_<tag>.txt`` pair the
frontier campaign (tools/frontier_campaign.sh) wrote into the experiment
dir and emits one markdown table: CIDEr / SPIDEr (accuracy, scored on the
first candidate — the reference's policy, base_runner.py:272-293) against
Div-1 / Div-2 / mBLEU-4 / vocab (within-clip diversity over all candidates,
utils/diverse_mutil.py semantics) and %novel vs the train corpus.

Usage:
    python tools/frontier_report.py <exp_dir> [--train_corpus=text.json]
        [--out=frontier.md]
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAGS = ["beam3", "dbs_l02", "dbs_l05", "dbs_l10", "dbs_l20",
        "dbs_t15", "dbs_t20", "dbs_g8", "dbs_g2",
        "samp_t07", "samp_t10", "samp_t13"]


def read_scores(path: str) -> dict:
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            m = re.match(r"^([A-Za-z_0-9]+): ([0-9.]+)", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def caps_by_id(eval_json: str) -> dict:
    from acvae_tpu.data.vocab import tokenize
    with open(eval_json) as f:
        data = json.load(f)
    out = {}
    for item in data["predictions"]:
        caps = item.get("captions")
        if caps:
            texts = [(c.get("tokens") or c["caption"])
                     if isinstance(c, dict) else c for c in caps]
        else:
            texts = [item.get("tokens") or item["caption"]]
        out[item["filename"]] = [" ".join(tokenize(t, False)) for t in texts]
    return out


def main():
    exp = sys.argv[1]
    train_corpus = None
    out_path = None
    human_path = None
    for a in sys.argv[2:]:
        if a.startswith("--train_corpus="):
            train_corpus = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--human="):
            human_path = a.split("=", 1)[1]

    from acvae_tpu.data.vocab import load_caption_info
    from acvae_tpu.evaluation.diversity import eval_div_stats, novelty

    train_caps = None
    if train_corpus:
        train_info = load_caption_info(train_corpus, False)
        train_caps = [c["tokens"] for a in train_info for c in a["captions"]]

    rows = []
    for tag in TAGS:
        hits = [p for p in os.listdir(exp)
                if p.startswith("eval_output_") and p.endswith(f"_{tag}.json")]
        if not hits:
            continue
        # shortest name = no extra mode suffix (an `_int8` artifact for the
        # same tag also ends with `_{tag}.json`)
        hits.sort(key=len)
        ej = os.path.join(exp, hits[0])
        sf = os.path.join(exp, hits[0].replace("eval_output_", "scores_")
                          .replace(".json", ".txt"))
        scores = read_scores(sf)
        caps = caps_by_id(ej)
        row = {"tag": tag, "CIDEr": scores.get("CIDEr"),
               "SPIDEr": scores.get("SPIDEr"),
               "Div1": None, "Div2": None, "mBLEU4": None, "vocab": None,
               "novel": None}
        if caps and min(len(v) for v in caps.values()) > 1:
            d = eval_div_stats(caps)
            row.update(Div1=d.get("Div1"), Div2=d.get("Div2"),
                       mBLEU4=d.get("mBLeu_4"), vocab=d.get("gDiv1"))
        if train_caps is not None:
            flat = [c for v in caps.values() for c in v]
            row["novel"] = novelty(flat, train_caps)
        rows.append(row)

    if human_path and os.path.exists(human_path):
        # human ceilings (cli human_eval output: "key: value" lines)
        h = read_scores(human_path)
        rows.append({"tag": "human (LOO ceiling)",
                     "CIDEr": h.get("CIDEr"), "SPIDEr": h.get("SPIDEr"),
                     "Div1": h.get("Div1"), "Div2": h.get("Div2"),
                     "mBLEU4": h.get("mBLeu_4"), "vocab": h.get("gDiv1"),
                     "novel": None})

    def fmt(v):
        if v is None:
            return "—"
        return f"{v:.3f}" if isinstance(v, float) else str(v)

    lines = ["| point | CIDEr | SPIDEr | Div-1 | Div-2 | mBLEU-4 | vocab | %novel |",
             "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        lines.append("| " + " | ".join(
            [r["tag"], fmt(r["CIDEr"]), fmt(r["SPIDEr"]), fmt(r["Div1"]),
             fmt(r["Div2"]), fmt(r["mBLEU4"]), fmt(r["vocab"]),
             fmt(r["novel"])]) + " |")
    table = "\n".join(lines)
    print(table)
    if out_path:
        with open(out_path, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
