"""Golden parity for eval/interleave.py: the native summary-level ROUGE-L
against the installed `rouge` package (the reference's actual scorer), the
answer normalization against the reference's own Eval class, and the full
pipeline against the reference's dispatch semantics."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from video3d_tpu.eval.interleave import (evaluate_multichoice,
                                         evaluate_rouge, interleave_metrics,
                                         process_answer, rouge_l_f)

REF = "/root/reference/llava/eval/evaluate_interleave.py"

CAPTIONS = [
    ("the brown chair sits next to a wooden table",
     "a brown chair is next to the table"),
    ("two lamps. one on the desk. one near the window",
     "there are two lamps, one on the desk and one by the window."),
    ("nothing changed between the two images",
     "the images are identical. nothing changed"),
    ("a red apple", "a green pear"),
    ("word", "word"),
    ("the quick brown fox jumps over the lazy dog. twice. or more",
     "a quick brown fox jumped over dogs. repeatedly"),
]


def _ref_eval():
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_interleave", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_interleave"] = mod
    spec.loader.exec_module(mod)
    return mod.Eval()


class TestRougeLGolden:
    def test_matches_rouge_package(self):
        rouge_pkg = pytest.importorskip("rouge")
        scorer = rouge_pkg.Rouge()
        for pred, gt in CAPTIONS:
            want = scorer.get_scores(pred, gt)[0]["rouge-l"]["f"]
            got = rouge_l_f(pred, gt)
            np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=pred)

    def test_process_matches_reference(self):
        E = _ref_eval()
        texts = [
            "  The Chair; is (brown)!  ",
            "a, b, 1,000 dots......",
            '"quoted" (paren) [brackets] x-y a_b',
            "line\nbreaks\tand tabs",
            "trailing period.",
            "." * 40 + " many periods " + "." * 40,
        ]
        for t in texts:
            assert process_answer(t) == E.process(t), repr(t)

    def test_evaluate_rouge_matches_reference(self):
        E = _ref_eval()
        preds = [{"sample_id": i, "pred_response": p, "gt_response": g,
                  "dataset": "IEdit", "question_type": "open-ended"}
                 for i, (p, g) in enumerate(CAPTIONS)]
        want, want_detail = E.evaluate_rouge(
            [dict(x) for x in preds])
        got, got_detail = evaluate_rouge(preds)
        np.testing.assert_allclose(got["Rouge-L f"], want["Rouge-L f"],
                                   rtol=1e-12)
        assert got_detail == want_detail

    def test_multichoice_matches_reference(self):
        E = _ref_eval()
        samples = [
            {"sample_id": 0, "pred_response": "Answer: B", "gt_response": "b"},
            {"sample_id": 1, "pred_response": "c", "gt_response": "c"},
            {"sample_id": 2, "pred_response": "the answer is: a, maybe",
             "gt_response": "a"},
            {"sample_id": 3, "pred_response": "d", "gt_response": "a"},
        ]
        want, want_detail = E.evaluate_multichoice(
            [dict(s) for s in samples])
        got, got_detail = evaluate_multichoice(samples)
        assert got == want
        assert got_detail == want_detail

    def test_pipeline_categories(self):
        records = []
        for i, (p, g) in enumerate(CAPTIONS[:3]):
            records.append({"dataset": "IEdit", "sample_id": f"e{i}",
                            "question_type": "open-ended",
                            "pred_response": p, "gt_response": g})
        records.append({"dataset": "RAVEN", "sample_id": "m0",
                        "question_type": "multi-choice",
                        "pred_response": "a", "gt_response": "a"})
        out = interleave_metrics(records)
        assert set(out["datasets"]) == {"IEdit", "RAVEN"}
        assert out["categories"]["puzzle"] == 1.0
        assert 0.0 < out["categories"]["image_edit_instruct"] <= 1.0
