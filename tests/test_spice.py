"""Native SPICE: scene-graph parse cases + tuple-F1 scoring.

The reference's SPICE is Java (pycocoevalcap, ``base_runner.py:303-305``);
these tests pin the behavior of the native approximation
(``evaluation/spice.py``): hand-derived scene graphs for caption-style
English and hand-computed F1 values.
"""
import math

from acvae_tpu.evaluation.spice import SpiceScorer, parse_scene_graph


def g(sentence):
    return parse_scene_graph(sentence.split())


def test_intransitive_with_adverb_and_pp():
    assert g("a dog barks loudly in a park") == {
        ("dog",), ("dog", "bark"), ("dog", "loudli"),
        ("dog", "in", "park"), ("park",),
    }


def test_plural_subject_lexicon_verb():
    assert g("dogs bark") == {("dog",), ("dog", "bark")}


def test_transitive_direct_object():
    assert g("a man plays a guitar") == {
        ("man",), ("guitar",), ("man", "play", "guitar"),
    }


def test_noun_modifier_becomes_attribute():
    assert g("water drips into a metal bucket") == {
        ("water",), ("water", "drip"), ("bucket",), ("bucket", "metal"),
        ("water", "into", "bucket"),
    }


def test_copular_predicate_adjective():
    assert g("the music is loud") == {("music",), ("music", "loud")}


def test_expletive_subject_skipped():
    assert g("there is a machine humming steadily") == {
        ("machin",), ("machin", "hum"), ("machin", "steadili"),
    }


def test_clause_split_on_while():
    graph = g("rain falls on a tin roof while thunder rumbles")
    assert ("rain", "fall") in graph
    assert ("roof", "tin") in graph
    assert ("rain", "on", "roof") in graph
    assert ("thunder", "rumbl") in graph


def test_passive_connector_relation():
    assert g("a young girl speaks followed by laughter") == {
        ("girl",), ("girl", "young"), ("girl", "speak"),
        ("girl", "follow", "laughter"), ("laughter",),
    }


def test_ing_noun_not_a_verb():
    graph = g("a bird sings near a building")
    assert ("bird", "sing") in graph
    assert ("build",) in graph or ("building",) in graph
    # "building" must be the PP object, not a verb
    assert not any(len(t) == 3 and t[1] == "build" for t in graph)


def test_identical_caption_scores_one():
    mean, per = SpiceScorer().compute_score(
        {"k": ["a dog barks loudly"]}, {"k": ["a dog barks loudly"]})
    assert mean == 1.0 and per == [1.0]


def test_disjoint_scores_zero():
    mean, _ = SpiceScorer().compute_score(
        {"k": ["water flows quietly"]}, {"k": ["a dog barks loudly"]})
    assert mean == 0.0


def test_stem_matching_across_inflections():
    mean, _ = SpiceScorer().compute_score(
        {"k": ["a dog is barking"]}, {"k": ["dogs bark"]})
    assert mean == 1.0


def test_partial_overlap_hand_computed():
    # cand "a dog barks in the park": tuples {dog, (dog,bark), park,
    #   (dog,in,park)} -> 4.  refs (union): adds (dog,loudli), (dog,near,
    #   park), (dog,loud) -> 7 total, all 4 cand tuples matched.
    mean, _ = SpiceScorer().compute_score(
        {"k": ["a dog barks loudly in a park",
               "dogs are barking near a park",
               "a loud dog barks"]},
        {"k": ["a dog barks in the park"]})
    p, r = 4 / 4, 4 / 7
    assert math.isclose(mean, 2 * p * r / (p + r))


def test_corpus_mean_over_keys():
    mean, per = SpiceScorer().compute_score(
        {"a": ["a dog barks"], "b": ["water flows"]},
        {"a": ["a dog barks"], "b": ["a dog barks"]})
    assert per == [1.0, 0.0] and mean == 0.5


def test_score_captions_reports_spice_and_spider():
    from acvae_tpu.evaluation.coco import score_captions
    out = score_captions({"k": ["a dog barks loudly"]},
                         {"k": ["a dog barks loudly"]})
    assert out["SPICE"] == 1.0
    assert math.isclose(out["SPIDEr"], (out["CIDEr"] + out["SPICE"]) / 2)
