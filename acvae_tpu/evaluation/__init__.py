from acvae_tpu.evaluation.coco import (
    BleuScorer, CiderScorer, RougeScorer, score_captions,
)
from acvae_tpu.evaluation.diversity import (
    compute_div_n, compute_global_div_n, eval_div_stats, self_bleu,
    novelty, ngram_richness,
)
