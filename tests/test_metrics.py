"""Golden parity of our pure-Python caption metrics against the reference's
vendored pycocoevalcap scorers (loaded directly from /root/reference, pure
numpy files). Skipped when the reference tree is absent."""

import importlib.util
import os

import numpy as np
import pytest

from video3d_tpu.eval.metrics import Bleu, Cider, Meteor, Rouge
from video3d_tpu.eval import protocols

REF = "/root/reference/llava/eval/caption_eval"
HAS_REF = os.path.isdir(REF)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GTS = {
    "a": ["a brown chair next to the table", "the chair is brown"],
    "b": ["two lamps on the desk", "a pair of lamps sit on the wooden desk"],
    "c": ["the door is open", "an open door"],
    "d": ["a red sofa in the corner of the room", "red couch in corner"],
}
RES = {
    "a": ["a brown chair beside the table"],
    "b": ["two lamps on a desk"],
    "c": ["the door is closed"],
    "d": ["a red sofa sits in the corner"],
}


@pytest.mark.skipif(not HAS_REF, reason="reference tree not mounted")
class TestGoldenParity:
    def test_cider_matches_reference(self):
        ref_mod = _load(os.path.join(REF, "cider/cider_scorer.py"), "ref_cider")
        scorer = ref_mod.CiderScorer(n=4, sigma=6.0)
        for k in GTS:
            scorer += (RES[k][0], GTS[k])
        ref_mean, ref_scores = scorer.compute_score()
        got_mean, got_scores = Cider().compute_score(GTS, RES)
        np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-8)
        np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-8)

    def test_bleu_matches_reference(self):
        ref_mod = _load(os.path.join(REF, "bleu/bleu_scorer.py"), "ref_bleu")
        scorer = ref_mod.BleuScorer(n=4)
        for k in GTS:
            scorer += (RES[k][0], GTS[k])
        ref, ref_per_sentence = scorer.compute_score(option="closest")
        got, got_per_sentence = Bleu().compute_score(GTS, RES, option="closest")
        np.testing.assert_allclose(got, ref, rtol=1e-10)
        np.testing.assert_allclose(got_per_sentence, ref_per_sentence, rtol=1e-10)

    def test_rouge_matches_reference(self):
        ref_mod = _load(os.path.join(REF, "rouge/rouge.py"), "ref_rouge")
        ref_scorer = ref_mod.Rouge()
        ref_mean, ref_scores = ref_scorer.compute_score(GTS, RES)
        got_mean, got_scores = Rouge().compute_score(GTS, RES)
        np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-10)
        np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-10)


class TestMeteor:
    def test_perfect_match_scores_high(self):
        s, _ = Meteor().compute_score({"a": ["the brown chair"]},
                                      {"a": ["the brown chair"]})
        assert s > 0.95

    def test_no_match_scores_zero(self):
        s, _ = Meteor().compute_score({"a": ["lamp desk window"]},
                                      {"a": ["chair sofa door"]})
        assert s == 0.0

    def test_stem_matching(self):
        s_stem, _ = Meteor().compute_score({"a": ["the walked dog"]},
                                           {"a": ["the walking dog"]})
        assert s_stem > 0.5


class TestProtocols:
    def test_clean_answer_matches_reference(self):
        import importlib.util as iu
        cases = ["  The  3 chairs.", "letf side", "it is behine you!",
                 "None", "o' clock", "a red chair", "backwards", "chai no1"]
        if HAS_REF:
            spec = iu.spec_from_file_location(
                "ref_sqa", "/root/reference/llava/eval/eval_sqa3d.py")
            # eval_sqa3d imports argparse/numpy only at module level
            mod = iu.module_from_spec(spec)
            spec.loader.exec_module(mod)
            for c in cases:
                assert protocols.clean_answer(c) == mod.clean_answer(c), c
        else:
            assert protocols.clean_answer("3 chairs") == "three chairs"

    def test_sqa3d_em(self):
        records = [
            {"pred_response": "3", "gt_response": "three", "question_type": "How"},
            {"pred_response": "left", "gt_response": "right", "question_type": "Which"},
        ]
        out = protocols.sqa3d_metrics(records)
        assert out["all"] == 50.0
        assert out["How"] == 100.0 and out["Which"] == 0.0

    def test_scanrefer_acc(self):
        box = [0, 0, 0, 2, 2, 2]
        shifted = [0.5, 0, 0, 2, 2, 2]   # IoU = 1.5*2*2/(8+8-6)=0.6
        records = [
            {"pred_response": box, "gt_response": box, "question_type": "unique"},
            {"pred_response": shifted, "gt_response": box, "question_type": "multiple"},
            {"pred_response": [5, 5, 5, 1, 1, 1], "gt_response": box,
             "question_type": "multiple"},
        ]
        out = protocols.scanrefer_metrics(records)
        assert out["all@0.25"] == pytest.approx(200 / 3)
        assert out["unique@0.5"] == 100.0
        assert out["multiple@0.5"] == 50.0

    def test_multi3drefer_selection_and_f1(self):
        objects = [[0, 0, 0, 1, 1, 1], [5, 5, 5, 1, 1, 1], [9, 9, 9, 1, 1, 1]]
        # zero-target wins -> no prediction; gt empty -> F1 = 1
        rec_zero = {"scores": [0.1, 0.1, 0.1, 5.0], "objects": objects,
                    "gt_response": [], "question_type": "zt"}
        # strong first object -> picks it; gt matches -> F1 = 1
        rec_hit = {"scores": [5.0, 0.0, 0.0, -5.0], "objects": objects,
                   "gt_response": [objects[0]], "question_type": "st"}
        out = protocols.multi3drefer_metrics([rec_zero, rec_hit])
        assert out["all@F1_0.25"] == 1.0
        assert out["zt@F1_0.5"] == 1.0 and out["st@F1_0.5"] == 1.0

    def test_hungarian_partial(self):
        pred = [[0, 0, 0, 2, 2, 2], [9, 9, 9, 1, 1, 1]]
        gt = [[0, 0, 0, 2, 2, 2]]
        f25, f50 = protocols.hungarian_f1(pred, gt)
        assert f25 == pytest.approx(2 * 1 / 3)
        assert f50 == pytest.approx(2 * 1 / 3)

    def test_scanqa_metrics_smoke(self):
        id2ans = {"q_0": ["a chair", "chair"], "r_0": ["two lamps"]}
        records = [
            {"sample_id": "q_3", "pred_response": "a chair"},
            {"sample_id": "r_1", "pred_response": "two lamps."},
        ]
        out = protocols.scanqa_metrics(records, id2ans)
        assert out["EM"] == 0.5          # 'two lamps.' not in answers
        assert out["CIDEr"] > 0
        assert 0 <= out["BLEU-4"] <= 100
