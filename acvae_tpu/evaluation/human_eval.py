"""Human / reference-caption upper bounds.

Equivalent of ``utils/human_eval.py:13-118`` and
``utils/diverse_mutil_human.py``: score each reference caption leave-one-out
against its siblings — the accuracy and diversity ceilings human annotators
achieve on the dataset.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from acvae_tpu.evaluation.coco import BleuScorer, CiderScorer, RougeScorer
from acvae_tpu.evaluation.diversity import eval_div_stats


def human_scores(key2refs: Dict[str, List[str]]) -> Dict[str, float]:
    """Leave-one-out accuracy scores over reference captions: each caption is
    scored as a "prediction" against the remaining references; results are
    averaged over the caption slots (human_eval.py:13-66)."""
    n_caps = min(len(v) for v in key2refs.values())
    agg: Dict[str, List[float]] = {}
    for i in range(n_caps):
        gts = {k: v[:i] + v[i + 1:] for k, v in key2refs.items()}
        res = {k: [v[i]] for k, v in key2refs.items()}
        bleu, _ = BleuScorer(4).compute_score(gts, res)
        cider, _ = CiderScorer().compute_score(gts, res)
        rouge, _ = RougeScorer().compute_score(gts, res)
        for name, val in [("Bleu_1", bleu[0]), ("Bleu_4", bleu[3]),
                          ("ROUGE_L", rouge), ("CIDEr", cider)]:
            agg.setdefault(name, []).append(val)
    return {k: float(np.mean(v)) for k, v in agg.items()}


def human_diversity(key2refs: Dict[str, List[str]]) -> Dict[str, float]:
    """Diversity ceilings of the reference captions themselves
    (diverse_mutil_human.py:100-116)."""
    return eval_div_stats(key2refs)
