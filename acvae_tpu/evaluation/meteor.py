"""Native METEOR (exact + Porter-stem + synonym stages).

The reference scores METEOR through pycocoevalcap's Java meteor-1.5 jar
(``runners/base_runner.py:303-305``), which needs Java plus the paraphrase
model.  This is a pure-Python implementation of the METEOR algorithm
(Banerjee & Lavie 2005; Lavie & Agarwal 2007) used when the Java backend is
unavailable:

* matcher stages: **exact**, then **Porter stem**, then **synonym** via the
  bundled compact table (evaluation/synonyms.py) — no WordNet corpus ships
  on this image, so the jar's WordNet-synset stage is approximated by ~150
  curated synonym groups; still a documented divergence (long-tail synsets
  are not covered).  ``ACVAE_METEOR_SYNONYMS=0`` disables the stage for
  the exact+stem A/B (RESULTS.md "native METEOR synonym stage"),
* METEOR-1.0 English parameters: Fmean = 10PR/(R + 9P),
  Penalty = 0.5 · (chunks/matches)³, score = Fmean · (1 − Penalty),
* per-segment score is the max over references; the corpus score is the
  segment mean (the jar aggregates sufficient statistics; the mean is within
  ~1e-2 on caption-length segments and strictly monotone in per-segment
  quality).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

try:
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover - nltk is baked into this image
    _STEMMER = None


def _stems(tokens: Sequence[str]) -> List[str]:
    if _STEMMER is None:
        return list(tokens)
    return [_STEMMER.stem(t) for t in tokens]


def _syn_keys(tokens: Sequence[str], tag: str) -> List[str]:
    """Map each token to its synonym-group key; words outside the table get
    a position-unique sentinel (never matches anything)."""
    from acvae_tpu.evaluation.synonyms import WORD2GROUP
    return [f"g{WORD2GROUP[t]}" if t in WORD2GROUP else f"{tag}{i}"
            for i, t in enumerate(tokens)]


def _synonyms_enabled() -> bool:
    import os
    return os.environ.get("ACVAE_METEOR_SYNONYMS", "1") != "0"


def _align(hyp: Sequence[str], ref: Sequence[str]) -> List[Tuple[int, int]]:
    """Greedy staged alignment (exact, stem, synonym) between unmatched
    unigrams.  Within a stage, each hyp position takes the unmatched ref
    position closest to continuing the previous chunk — the tie-break the
    official aligner optimizes for (fewest chunks)."""
    h_stems, r_stems = _stems(hyp), _stems(ref)
    stages = [(hyp, ref), (h_stems, r_stems)]
    if _synonyms_enabled():
        stages.append((_syn_keys(hyp, "h"), _syn_keys(ref, "r")))
    matched_h: Dict[int, int] = {}
    used_r = set()
    for keyed_h, keyed_r in stages:
        prev_r = -1
        for i in range(len(hyp)):
            if i in matched_h:
                prev_r = matched_h[i]
                continue
            cands = [j for j in range(len(ref))
                     if j not in used_r and keyed_r[j] == keyed_h[i]]
            if not cands:
                continue
            j = min(cands, key=lambda j: (abs(j - (prev_r + 1)), j))
            matched_h[i] = j
            used_r.add(j)
            prev_r = j
    return sorted(matched_h.items())


def _chunks(pairs: List[Tuple[int, int]]) -> int:
    ch = 0
    prev = None
    for i, j in pairs:
        if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
            ch += 1
        prev = (i, j)
    return ch


def sentence_meteor(hyp: str, refs: Sequence[str]) -> float:
    """METEOR of one hypothesis against its references (max over refs)."""
    h = hyp.lower().split()
    best = 0.0
    for ref in refs:
        r = ref.lower().split()
        if not h or not r:
            continue
        pairs = _align(h, r)
        m = len(pairs)
        if m == 0:
            continue
        p, rec = m / len(h), m / len(r)
        fmean = 10.0 * p * rec / (rec + 9.0 * p)
        penalty = 0.5 * (_chunks(pairs) / m) ** 3
        best = max(best, fmean * (1.0 - penalty))
    return best


def meteor_score(key2refs: Dict[str, List[str]],
                 key2pred: Dict[str, List[str]]) -> Tuple[float, List[float]]:
    """(corpus mean, per-key scores) in pycocoevalcap compute_score shape."""
    scores = [sentence_meteor(key2pred[k][0], key2refs[k])
              for k in key2pred]
    return (sum(scores) / len(scores) if scores else 0.0), scores
