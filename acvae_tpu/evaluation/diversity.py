"""Diversity metrics — the paper's headline diversity suite.

Equivalents of the reference CLIs (``utils/diverse_mutil.py``,
``utils/div_utils.py``, ``utils/diverse_instance.py``, ``utils/diverse_eval.py``):

* :func:`compute_div_n` / :func:`compute_global_div_n` — per-audio distinct-n
  ratio and corpus vocabulary size (div_utils.py:11-45).
* :func:`eval_div_stats` — Div-1/Div-2/gDiv-1 + mBLEU (leave-one-out corpus
  BLEU among each audio's candidate captions, diverse_mutil.py:17-54).
* :func:`self_bleu` — sentence-level self-BLEU with nltk smoothing method1
  (diverse_mutil.py:60-77).
* :func:`novelty` — fraction of generated sentences not present in the train
  corpus (diverse_instance.py:71-96).
* :func:`ngram_richness` — inverse-frequency "Diversity" score
  (diverse_eval.py:10-42): mean over captions of
  sum(1/count(gram in corpus)) / #grams for n=1,2.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from acvae_tpu.evaluation.coco import BleuScorer


def _find_ngrams(tokens: Sequence[str], n: int):
    return zip(*[tokens[i:] for i in range(n)])


def compute_div_n(caps: Dict[str, List[str]], n: int = 1) -> Tuple[float, np.ndarray]:
    """Per-audio distinct-n: unique n-grams / total tokens (div_utils.py:11-29)."""
    aggr = []
    for k in caps:
        all_ngrams = set()
        total = 0.0
        for c in caps[k]:
            tkns = c.split()
            total += len(tkns)
            all_ngrams.update(_find_ngrams(tkns, n))
        aggr.append(len(all_ngrams) / (1e-6 + total))
    arr = np.array(aggr)
    return float(arr.mean()), arr


def compute_global_div_n(caps: Dict[str, List[str]], n: int = 1) -> float:
    """Corpus-level: vocabulary size for n=1, distinct-n ratio otherwise
    (div_utils.py:31-45)."""
    all_ngrams = set()
    total = 0.0
    for k in caps:
        for c in caps[k]:
            tkns = c.split()
            total += len(tkns)
            all_ngrams.update(_find_ngrams(tkns, n))
    if n == 1:
        return float(len(all_ngrams))
    return len(all_ngrams) / (1e-6 + total)


def eval_div_stats(caps_by_id: Dict[str, List[str]]) -> Dict[str, float]:
    """Div1/Div2/gDiv1 + mBLEU-1..4 (diverse_mutil.py:17-54).

    caps_by_id: audio_id -> list of candidate caption strings (already
    tokenized text; the reference PTB-tokenizes first, our captions are
    vocab-token strings so that is a no-op).  Ragged candidate counts use
    the smallest count (extra candidates are ignored, like human_scores);
    mBLEU needs >= 2 candidates per audio and is reported as NaN below that
    (the reference assumes a uniform n and would crash)."""
    n_caps = min(len(v) for v in caps_by_id.values())
    div1, _ = compute_div_n(caps_by_id, 1)
    div2, _ = compute_div_n(caps_by_id, 2)
    gdiv1 = compute_global_div_n(caps_by_id, 1)

    out = {"Div1": div1, "Div2": div2, "gDiv1": gdiv1}
    if n_caps < 2:
        for k in range(4):
            out[f"mBLeu_{k + 1}"] = float("nan")
        return out
    scorer = BleuScorer(4)
    all_scrs = []
    for i in range(n_caps):
        refs = {k: v[:i] + v[i + 1:n_caps] for k, v in caps_by_id.items()}
        cands = {k: [v[i]] for k, v in caps_by_id.items()}
        score, _ = scorer.compute_score(refs, cands)
        all_scrs.append(score)
    mbleu = np.array(all_scrs).mean(axis=0)
    for k in range(4):
        out[f"mBLeu_{k + 1}"] = float(mbleu[k])
    return out


def self_bleu(sentences: List[str]) -> float:
    """Mean leave-one-out sentence BLEU, nltk smoothing method1
    (diverse_mutil.py:60-77)."""
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    smoother = SmoothingFunction().method1
    toks = [s.split() for s in sentences]
    total = 0.0
    for i, hyp in enumerate(toks):
        refs = toks[:i] + toks[i + 1:]
        total += sentence_bleu(refs, hyp, smoothing_function=smoother)
    return total / len(toks)


def novelty(pred_sentences: Iterable[str], train_sentences: Iterable[str]) -> float:
    """% of predictions absent from the train corpus (diverse_instance.py:71-96)."""
    train = set(train_sentences)
    preds = list(pred_sentences)
    novel = sum(1 for p in preds if p not in train)
    return novel / max(len(preds), 1)


def ngram_richness(captions: List[str]) -> float:
    """Inverse-frequency diversity score (diverse_eval.py:10-42): for n=1,2
    compute per-caption mean of 1/corpus-count per n-gram, then average."""
    scores = []
    for n in (1, 2):
        corpus: Counter = Counter()
        per_caption = []
        for c in captions:
            per_caption.append(list(_find_ngrams(c.split(), n)))
            corpus.update(per_caption[-1])
        vals = []
        for grams in per_caption:
            if not grams:
                continue
            vals.append(sum(1.0 / corpus[g] for g in grams) / len(grams))
        scores.append(np.mean(vals) if vals else 0.0)
    return float(np.mean(scores))
