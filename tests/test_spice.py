"""Native SPICE scorer tests (evalcap/spice_native.py).

The reference's SPICE is a jar wrapper (reference eval/spice/spice.py:18-126);
no golden jar output exists in the snapshot, so these tests pin the native
implementation's semantics: scene-graph tuple extraction on caption-shaped
sentences (objects / attributes / relations per arXiv:1607.08822), hand-derived
F1 values, and ordering sanity (better captions score higher).
"""
import numpy as np
import pytest

from on_device_image_captioning_tpu.evalcap.spice_native import (
    NativeSpiceScorer,
    SceneGraph,
    lemmatize_noun,
    lemmatize_verb,
    parse_scene_graph,
    spice_score,
    tag_tokens,
)


class TestLemmatizer:
    def test_noun_plurals(self):
        assert lemmatize_noun("horses") == "horse"
        assert lemmatize_noun("men") == "man"
        assert lemmatize_noun("people") == "person"
        assert lemmatize_noun("children") == "child"
        assert lemmatize_noun("benches") == "bench"
        assert lemmatize_noun("knives") == "knife"
        assert lemmatize_noun("babies") == "baby"
        assert lemmatize_noun("grass") == "grass"
        assert lemmatize_noun("tennis") == "tennis"
        assert lemmatize_noun("bus") == "bus"

    def test_verb_forms(self):
        assert lemmatize_verb("riding") == "ride"
        assert lemmatize_verb("rides") == "ride"
        assert lemmatize_verb("rode") == "ride"
        assert lemmatize_verb("sitting") == "sit"
        assert lemmatize_verb("sat") == "sit"
        assert lemmatize_verb("standing") == "stand"
        assert lemmatize_verb("wearing") == "wear"
        assert lemmatize_verb("carries") == "carry"
        assert lemmatize_verb("held") == "hold"


class TestTagger:
    def test_simple_caption(self):
        toks = "a man riding a horse on a beach".split()
        assert tag_tokens(toks) == [
            "DT", "NN", "VB", "DT", "NN", "IN", "DT", "NN",
        ]

    def test_participial_adjective(self):
        # VB directly modifying a following noun retags as JJ
        toks = "a standing man".split()
        assert tag_tokens(toks) == ["DT", "JJ", "NN"]

    def test_ing_noun_exception(self):
        toks = "a tall building".split()
        assert tag_tokens(toks) == ["DT", "JJ", "NN"]


class TestParser:
    def test_subject_verb_object(self):
        g = parse_scene_graph("a man riding a horse")
        assert ("man",) in g.objects and ("horse",) in g.objects
        assert ("man", "ride", "horse") in g.relations

    def test_attributes_and_compounds(self):
        # the published SPICE example parse: "a young girl standing on top of
        # a tennis court" -> (girl, young), (court, tennis), on-top-of relation
        g = parse_scene_graph("a young girl standing on top of a tennis court")
        assert ("girl", "young") in g.attributes
        assert ("court", "tennis") in g.attributes
        assert any(
            r[0] == "girl" and r[-1] == "court" and "on top of" in r[1]
            for r in g.relations
        )

    def test_prepositional_relation(self):
        g = parse_scene_graph("a cat on a table")
        assert ("cat", "on", "table") in g.relations

    def test_chained_preps_attach_to_nearest(self):
        g = parse_scene_graph("a man on a horse in a field")
        assert ("man", "on", "horse") in g.relations
        assert ("horse", "in", "field") in g.relations

    def test_verb_plus_prep(self):
        g = parse_scene_graph("a dog jumping over a fence")
        assert ("dog", "jump over", "fence") in g.relations

    def test_conjunction_distributes(self):
        g = parse_scene_graph("a man and a woman walking on a beach")
        assert ("man", "walk on", "beach") in g.relations
        assert ("woman", "walk on", "beach") in g.relations

    def test_predicative_adjective(self):
        g = parse_scene_graph("the horse is brown")
        assert ("horse", "brown") in g.attributes

    def test_copula_skipped(self):
        g = parse_scene_graph("a man is riding a horse")
        assert ("man", "ride", "horse") in g.relations

    def test_intransitive_verb_becomes_attribute(self):
        g = parse_scene_graph("a baby smiling")
        assert ("baby", "smile") in g.attributes

    def test_plurals_lemmatized(self):
        g = parse_scene_graph("two men riding horses")
        assert ("man",) in g.objects and ("horse",) in g.objects
        assert ("man", "two") in g.attributes
        assert ("man", "ride", "horse") in g.relations


class TestScoring:
    def test_identical_caption_scores_one(self):
        c = "a man riding a horse on a beach"
        assert spice_score(c, [c]) == pytest.approx(1.0)

    def test_disjoint_scores_zero(self):
        assert spice_score(
            "a red bus parked on a street", ["two dogs playing with a ball"]
        ) == pytest.approx(0.0)

    def test_hand_derived_f1(self):
        # cand: objects {man, horse}, relations {(man, ride, horse)} -> 3 tuples
        # ref:  objects {man, beach},  relations {(man, walk on, beach)} -> 3
        # overlap = {(man,)} -> P = R = 1/3, F1 = 1/3
        f = spice_score("a man riding a horse", ["a man walking on a beach"])
        assert f == pytest.approx(1.0 / 3.0)

    def test_union_over_references(self):
        # each ref contributes tuples to one union pool
        f = spice_score(
            "a man riding a horse",
            ["a man standing", "a brown horse", "a man riding a horse"],
        )
        # all 3 candidate tuples appear in the union -> P = 1
        cand = parse_scene_graph("a man riding a horse").tuples()
        union = set()
        for r in ["a man standing", "a brown horse", "a man riding a horse"]:
            union |= parse_scene_graph(r).tuples()
        p = len(cand & union) / len(cand)
        r_ = len(cand & union) / len(union)
        assert f == pytest.approx(2 * p * r_ / (p + r_))
        assert p == pytest.approx(1.0)

    def test_better_caption_scores_higher(self):
        refs = [
            "a young girl riding a brown horse on a sandy beach",
            "a girl rides a horse near the ocean",
        ]
        good = spice_score("a girl riding a horse on a beach", refs)
        weak = spice_score("a girl on a beach", refs)
        bad = spice_score("a plate of food on a table", refs)
        assert good > weak > bad

    def test_inflection_robust_matching(self):
        # same content, different inflections -> full credit via lemmas
        f = spice_score("two men ride horses", ["two men riding horses"])
        assert f == pytest.approx(1.0)


class TestScorerAPI:
    def test_compute_shapes_and_mean(self):
        gts = {
            1: ["a man riding a horse", "a person on a horse"],
            2: ["a red bus on a street"],
        }
        res = {1: ["a man riding a horse"], 2: ["a blue car on a road"]}
        mean, per = NativeSpiceScorer().compute(gts, res)
        assert per.shape == (2,)
        assert mean == pytest.approx(per.mean())
        assert per[0] > per[1]

    def test_harness_integration(self):
        from on_device_image_captioning_tpu.evalcap.harness import (
            evaluate_captions,
        )

        preds = {0: "a man riding a horse", 1: "a cat sitting on a table"}
        refs = {
            0: ["a man riding a horse on a beach"],
            1: ["a cat sitting on a wooden table"],
        }
        out = evaluate_captions(preds, refs, metrics=("cider", "spice"))
        assert "SPICE" in out and 0.0 < out["SPICE"] <= 1.0

    def test_empty_candidate(self):
        mean, per = NativeSpiceScorer().compute({1: ["a man"]}, {1: [""]})
        assert mean == 0.0

    def test_scene_graph_type(self):
        g = parse_scene_graph("a dog")
        assert isinstance(g, SceneGraph)
        assert g.tuples() == g.objects | g.attributes | g.relations


class TestSynonymStage:
    def test_synonym_tuple_match(self):
        """'a man rides a bike' vs 'a guy rides a bicycle': zero exact/stem
        tuple overlap, but every tuple matches element-wise through the
        embedded synonym table (man~guy, bike~bicycle) -> F1 = 1."""
        from on_device_image_captioning_tpu.evalcap.spice_native import (
            spice_score,
        )

        got = spice_score("a man rides a bike", ["a guy rides a bicycle"])
        assert got == 1.0
        # without the synonym stage the same pair scores 0
        assert spice_score(
            "a man rides a bike", ["a guy rides a bicycle"], synonyms=False
        ) == 0.0

    def test_synonym_stage_is_one_to_one(self):
        """Two candidate 'man' objects cannot both claim one ref 'guy'."""
        from on_device_image_captioning_tpu.evalcap.spice_native import _f1

        f, p, r = _f1(
            frozenset({("man",), ("male",)}), frozenset({("guy",)})
        )
        assert p == 0.5 and r == 1.0

    def test_non_synonyms_unmatched(self):
        from on_device_image_captioning_tpu.evalcap.spice_native import (
            spice_score,
        )

        assert spice_score("a man rides a horse", ["a guy rides a bicycle"]) < 1.0
