"""Metric tests: CIDEr-D sanity properties, official VQA accuracy
semantics, postprocessors, ROC-AUC."""

import numpy as np

from open_flamingo_tpu.eval.metrics import (
    cider_d,
    postprocess_captioning_generation,
    postprocess_vqa_generation,
    roc_auc,
    vqa_accuracy,
)
from open_flamingo_tpu.eval.metrics.ok_vqa_stem import stem_answer
from open_flamingo_tpu.eval.metrics.vqa_accuracy import normalize_answer


def test_cider_perfect_match_beats_partial():
    refs = {
        "1": ["a dog runs in the park", "the dog is running in a park"],
        "2": ["a cat sits on the mat", "the cat is sitting on a mat"],
    }
    perfect = {"1": "a dog runs in the park", "2": "a cat sits on the mat"}
    partial = {"1": "a dog in the park", "2": "a cat on the mat"}
    wrong = {"1": "completely unrelated words here", "2": "other nonsense text"}
    s_perfect = cider_d(perfect, refs)
    s_partial = cider_d(partial, refs)
    s_wrong = cider_d(wrong, refs)
    assert s_perfect > s_partial > s_wrong
    assert s_wrong < 0.5
    assert 0 <= s_perfect <= 10


def test_cider_repetition_penalized():
    # idf needs a corpus of >1 image (log(N/df) is 0 for N=1)
    refs = {
        "1": ["a dog runs in the park"],
        "2": ["a bird flies over the sea"],
    }
    normal = {"1": "a dog runs in the park", "2": "a bird flies over the sea"}
    repeat = {"1": "dog dog dog dog dog dog", "2": "bird bird bird bird bird"}
    assert cider_d(normal, refs) > cider_d(repeat, refs)


def test_vqa_accuracy_official_semantics():
    gts = ["yes"] * 10
    assert vqa_accuracy("yes", gts) == 1.0
    assert vqa_accuracy("no", gts) == 0.0
    # 3 of 10 matching -> each subset has >=2 matches among the other 9:
    # subsets dropping a "yes" see 2 matches (2/3), others see 3 (1.0)
    gts = ["yes"] * 3 + ["no"] * 7
    acc = vqa_accuracy("yes", gts)
    assert abs(acc - (3 * (2 / 3) + 7 * 1.0 * 0) / 10 - 0.7 * 0) < 1 or True
    expected = (3 * min(2 / 3, 1) + 7 * min(3 / 3, 1)) / 10
    assert abs(acc - expected) < 1e-9


def test_vqa_normalization():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a dog") == "dog"
    assert normalize_answer("isnt") == "isn't"
    assert normalize_answer("yes.") == "yes"
    # normalization applies only when answers disagree
    assert vqa_accuracy("2", ["two"] * 5 + ["2"] * 5) == 1.0


def test_postprocessors():
    assert postprocess_captioning_generation("a cat Output:junk") == "a cat "
    assert postprocess_vqa_generation("blue Question: what else") == "blue "
    assert postprocess_vqa_generation("red, green and blue") == "red"
    assert stem_answer("dogs") == "dog"
    assert stem_answer("children") == "child"
    assert stem_answer("glass") == "glass"
    assert stem_answer("berries") in ("berry", "berries")


def test_roc_auc():
    labels = [1, 1, 0, 0]
    scores = [0.9, 0.8, 0.2, 0.1]
    assert roc_auc(labels, scores) == 1.0
    assert roc_auc(labels, [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert abs(roc_auc([1, 0], [0.5, 0.5]) - 0.5) < 1e-9
