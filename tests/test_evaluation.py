"""Metric correctness: BLEU vs nltk, CIDEr/ROUGE sanity, diversity formulas."""
import numpy as np
import pytest

from acvae_tpu.evaluation.coco import BleuScorer, CiderScorer, RougeScorer, score_captions
from acvae_tpu.evaluation.diversity import (
    compute_div_n, compute_global_div_n, eval_div_stats, ngram_richness,
    novelty, self_bleu,
)

GTS = {
    "a": ["a dog is barking loudly", "the dog barks in the yard"],
    "b": ["rain falls on the roof", "heavy rain is falling outside"],
    "c": ["a car drives past quickly", "the car passes by on the road"],
}
RES_PERFECT = {"a": ["a dog is barking loudly"],
               "b": ["rain falls on the roof"],
               "c": ["a car drives past quickly"]}
RES_PARTIAL = {"a": ["a dog is sleeping"],
               "b": ["rain falls down"],
               "c": ["a truck is loud"]}


class TestBleu:
    def test_perfect_match_is_one(self):
        scores, _ = BleuScorer(4).compute_score(GTS, RES_PERFECT)
        for s in scores:
            assert s == pytest.approx(1.0, abs=1e-6)

    def test_matches_nltk_corpus_bleu(self):
        from nltk.translate.bleu_score import corpus_bleu
        refs = [[r.split() for r in GTS[k]] for k in GTS]
        hyps = [RES_PARTIAL[k][0].split() for k in GTS]
        ours, _ = BleuScorer(4).compute_score(GTS, RES_PARTIAL)
        for n in (1, 2):
            weights = tuple([1.0 / n] * n)
            ref = corpus_bleu(refs, hyps, weights=weights)
            assert ours[n - 1] == pytest.approx(ref, rel=1e-4), f"BLEU-{n}"

    def test_order_sensitivity(self):
        good, _ = BleuScorer(4).compute_score(GTS, RES_PERFECT)
        bad, _ = BleuScorer(4).compute_score(GTS, RES_PARTIAL)
        assert good[3] > bad[3]


class TestCider:
    def test_perfect_is_ten(self):
        # identical to one ref still < 10 unless all refs identical; use
        # single-ref gts
        gts1 = {k: [v[0]] for k, v in GTS.items()}
        score, per = CiderScorer().compute_score(gts1, RES_PERFECT)
        assert score == pytest.approx(10.0, abs=1e-6)

    def test_disjoint_is_zero(self):
        res = {k: ["zzz yyy xxx www"] for k in GTS}
        score, _ = CiderScorer().compute_score(GTS, res)
        assert score == pytest.approx(0.0, abs=1e-6)

    def test_partial_between(self):
        score, _ = CiderScorer().compute_score(GTS, RES_PARTIAL)
        assert 0.0 < score < 10.0


class TestRouge:
    def test_perfect_is_one(self):
        score, _ = RougeScorer().compute_score(
            {k: [v[0]] for k, v in GTS.items()}, RES_PERFECT)
        assert score == pytest.approx(1.0, abs=1e-6)

    def test_hand_computed(self):
        # hyp="a b c", ref="a x c": lcs=2, p=2/3, r=2/3 -> f=2/3
        gts = {"k": ["a x c"]}
        res = {"k": ["a b c"]}
        score, _ = RougeScorer().compute_score(gts, res)
        assert score == pytest.approx(2 / 3, abs=1e-6)


class TestScoreCaptions:
    def test_full_table(self):
        out = score_captions(GTS, RES_PARTIAL)
        assert set(out) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr", "SPIDEr"}
        assert out["SPIDEr"] is not None


class TestDiversity:
    CAPS = {
        "a": ["a dog barks", "the dog is barking", "a dog barks"],
        "b": ["rain falls", "the rain is falling", "water drips down"],
    }

    def test_div_n(self):
        mean, per = compute_div_n(self.CAPS, 1)
        # audio a: tokens = 3+4+3=10, unique={a,dog,barks,the,is,barking}=6
        assert per[0] == pytest.approx(6 / (10 + 1e-6), rel=1e-5)

    def test_global_div1_is_vocab(self):
        v = compute_global_div_n(self.CAPS, 1)
        vocab = set()
        for caps in self.CAPS.values():
            for c in caps:
                vocab.update(c.split())
        assert v == len(vocab)

    def test_eval_div_stats_keys(self):
        out = eval_div_stats(self.CAPS)
        assert set(out) == {"Div1", "Div2", "gDiv1",
                            "mBLeu_1", "mBLeu_2", "mBLeu_3", "mBLeu_4"}
        # duplicated caption in audio a should make mBLEU high
        assert out["mBLeu_1"] > 0.3

    def test_self_bleu_repetition(self):
        rep = self_bleu(["a dog barks loudly today"] * 3)
        div = self_bleu(["a dog barks loudly today",
                         "rain falls on roofs here",
                         "cars pass by very fast"])
        assert rep > div

    def test_novelty(self):
        assert novelty(["x y", "a b"], ["a b"]) == 0.5

    def test_ngram_richness_monotone(self):
        rich = ngram_richness(["a b c", "d e f", "g h i"])
        poor = ngram_richness(["a b c", "a b c", "a b c"])
        assert rich > poor


class TestMeteor:
    """Native METEOR (evaluation/meteor.py): hand-computed values."""

    def test_hand_computed(self):
        from acvae_tpu.evaluation.meteor import sentence_meteor
        # h matches all 6 tokens; ref has 7; alignment breaks into 2 chunks
        s = sentence_meteor("the cat sat on the mat",
                            ["the cat was sat on the mat"])
        p, r = 1.0, 6 / 7
        fmean = 10 * p * r / (r + 9 * p)
        penalty = 0.5 * (2 / 6) ** 3
        assert abs(s - fmean * (1 - penalty)) < 1e-9

    def test_identical_is_near_one(self):
        from acvae_tpu.evaluation.meteor import sentence_meteor
        s = sentence_meteor("a dog barks", ["a dog barks"])
        # one chunk, all matched: penalty = 0.5*(1/3)^3
        assert abs(s - (1.0 - 0.5 * (1 / 3) ** 3)) < 1e-9

    def test_stem_stage_matches(self):
        from acvae_tpu.evaluation.meteor import sentence_meteor
        assert sentence_meteor("dogs barking", ["dog barks"]) > 0.5
        assert sentence_meteor("cats meow", ["dog barks"]) == 0.0

    def test_synonym_stage_matches(self, monkeypatch):
        """The bundled synonym table (evaluation/synonyms.py) recovers
        credit for paraphrases the jar's WordNet stage would catch;
        ACVAE_METEOR_SYNONYMS=0 restores exact+stem for the A/B."""
        from acvae_tpu.evaluation.meteor import sentence_meteor
        monkeypatch.delenv("ACVAE_METEOR_SYNONYMS", raising=False)
        with_syn = sentence_meteor("the automobile is loud",
                                   ["the car is noisy"])
        monkeypatch.setenv("ACVAE_METEOR_SYNONYMS", "0")
        without = sentence_meteor("the automobile is loud",
                                  ["the car is noisy"])
        assert with_syn > without > 0.0
        # all four tokens align with synonyms: car↔automobile, loud↔noisy
        assert with_syn > 0.9
        # unrelated words still never match
        monkeypatch.delenv("ACVAE_METEOR_SYNONYMS", raising=False)
        assert sentence_meteor("piano jazz", ["thunder rumbles"]) == 0.0

    def test_synonym_groups_disjoint(self):
        from acvae_tpu.evaluation.synonyms import SYNONYM_GROUPS
        seen = {}
        for gid, group in enumerate(SYNONYM_GROUPS):
            for w in group:
                assert w not in seen, \
                    f"{w!r} in groups {seen[w]} and {gid}"
                seen[w] = gid

    def test_max_over_refs_and_corpus(self):
        from acvae_tpu.evaluation.meteor import meteor_score, sentence_meteor
        refs = {"k": ["a dog barks", "completely different text"]}
        assert sentence_meteor("a dog barks", refs["k"]) == \
            sentence_meteor("a dog barks", ["a dog barks"])
        mean, per = meteor_score(refs, {"k": ["a dog barks"]})
        assert mean == per[0] > 0.9

    def test_wired_into_score_captions(self):
        from acvae_tpu.evaluation.coco import score_captions
        out = score_captions({"k": ["a dog barks loudly"]},
                             {"k": ["a dog barks loudly"]})
        assert out["METEOR"] is not None and out["METEOR"] > 0.9


class TestRawTextIngestion:
    """PTB-tokenization stand-in (base_runner.py:163-196): raw external
    caption text must score identically to pre-tokenized input."""

    def test_score_captions_normalizes_raw_text(self):
        from acvae_tpu.evaluation.coco import score_captions
        refs_tok = {"a": ["a dog barks loudly", "the dog is barking"],
                    "b": ["rain falls on a roof", "heavy rain hits a roof"]}
        refs_raw = {"a": ["A dog barks, loudly!", "The Dog is barking."],
                    "b": ["Rain falls on a roof.", "Heavy rain hits a ROOF"]}
        pred_tok = {"a": ["a dog barks"], "b": ["rain falls on a roof"]}
        pred_raw = {"a": ["A Dog barks!"], "b": ["Rain falls, on a roof."]}
        s_tok = score_captions(refs_tok, pred_tok)
        s_raw = score_captions(refs_raw, pred_raw)
        for k in s_tok:
            if k.startswith("_"):  # metadata (e.g. _native_scorers)
                continue
            if s_tok[k] is not None:
                assert abs(s_tok[k] - s_raw[k]) < 1e-9, k
        # no Java in this image: the native-fallback marker must be present
        assert set(s_tok.get("_native_scorers", [])) == {"METEOR", "SPICE"}

    def test_load_caption_info_synthesizes_tokens(self, tmp_path):
        import json

        from acvae_tpu.data.vocab import load_caption_info
        p = tmp_path / "raw.json"
        p.write_text(json.dumps({"audios": [
            {"audio_id": "x", "captions": [
                {"caption": "A loud DOG barks!"},
                {"caption": "water drips.", "tokens": "water drips"}]}]}))
        info = load_caption_info(str(p))
        assert info[0]["captions"][0]["tokens"] == "a loud dog barks"
        assert info[0]["captions"][1]["tokens"] == "water drips"

    def test_diversity_cli_accepts_raw_captions(self, tmp_path):
        import json

        from acvae_tpu.cli.main import Runner
        preds = {"predictions": [
            {"filename": "x", "captions": [
                {"caption": "A dog BARKS loudly!"},
                {"caption": "a dog is barking."}]},
            {"filename": "y", "captions": [
                {"caption": "Rain falls."}, {"caption": "rain, falling"}]}]}
        raw = tmp_path / "raw.json"
        raw.write_text(json.dumps(preds))
        tok = tmp_path / "tok.json"
        tok.write_text(json.dumps({"predictions": [
            {"filename": it["filename"],
             "captions": [{"tokens": " ".join(
                 c["caption"].lower().replace("!", "").replace(".", "")
                 .replace(",", "").split())} for c in it["captions"]]}
            for it in preds["predictions"]]}))
        r_raw = Runner().diversity(str(raw))
        r_tok = Runner().diversity(str(tok))
        assert r_raw == r_tok
