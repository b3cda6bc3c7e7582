import sys

import numpy as np
import pytest

from navillm_tpu.eval.captioning import Bleu, Cider, Rouge

GTS = {
    "a": ["the cat sits on the mat", "a cat is on the mat"],
    "b": ["a man rides a horse", "someone riding a horse outdoors"],
    "c": ["two dogs play in the park", "dogs playing on grass"],
}
RES = {
    "a": ["the cat sits on a mat"],
    "b": ["a man is riding a horse"],
    "c": ["a dog plays in the park"],
}


def _reference_modules():
    sys.path.insert(0, "/root/reference")
    try:
        from tools.evaluation.bleu import Bleu as RefBleu
        from tools.evaluation.rouge import Rouge as RefRouge
        from tools.evaluation.cider import Cider as RefCider
        return RefBleu, RefRouge, RefCider
    finally:
        sys.path.remove("/root/reference")


ref_available = True
try:
    _reference_modules()
except Exception:
    ref_available = False

needs_ref = pytest.mark.skipif(not ref_available,
                               reason="reference impl not importable")


@needs_ref
def test_bleu_matches_reference():
    RefBleu, _, _ = _reference_modules()
    score, _ = Bleu().compute_score(GTS, RES)
    ref_score, _ = RefBleu().compute_score(GTS, RES)
    np.testing.assert_allclose(score, ref_score, rtol=1e-6)


@needs_ref
def test_rouge_matches_reference():
    _, RefRouge, _ = _reference_modules()
    score, scores = Rouge().compute_score(GTS, RES)
    ref_score, ref_scores = RefRouge().compute_score(GTS, RES)
    np.testing.assert_allclose(score, ref_score, rtol=1e-6)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-6)


@needs_ref
def test_cider_matches_reference():
    _, _, RefCider = _reference_modules()
    score, scores = Cider().compute_score(GTS, RES)
    ref_score, ref_scores = RefCider().compute_score(GTS, RES)
    np.testing.assert_allclose(score, ref_score, rtol=1e-6)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-6)


def test_bleu_perfect_match():
    score, _ = Bleu().compute_score({"x": ["a b c d e"]}, {"x": ["a b c d e"]})
    assert all(abs(s - 1.0) < 1e-6 for s in score)


def test_rouge_identity():
    score, _ = Rouge().compute_score({"x": ["hello world"]},
                                     {"x": ["hello world"]})
    assert abs(score - 1.0) < 1e-9


def test_exact_match_path_is_high_cider():
    gts = {str(i): [f"answer {i} text"] for i in range(5)}
    res = {str(i): [f"answer {i} text"] for i in range(5)}
    score, _ = Cider().compute_score(gts, res)
    assert score > 5.0
