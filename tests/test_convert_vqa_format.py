"""convert_vqa_format: output schema must match the reference's
vendored VQA-format files key-for-key
(/root/reference/open_flamingo/eval/data/{textvqa,vizwiz})."""

import json
import os

import pytest

from open_flamingo_tpu.scripts.convert_vqa_format import (
    convert_textvqa,
    convert_vizwiz,
)

REF = "/root/reference/open_flamingo/eval/data"


def test_textvqa_schema():
    raw = {"data": [
        {"question": "what is it?", "image_id": "abc123",
         "question_id": 7, "answers": ["dog", "cat"] * 5},
        {"question": "color?", "image_id": "def456",
         "question_id": 8, "answers": ["red"] * 10},
    ]}
    q, a = convert_textvqa(raw)
    assert [x["question_id"] for x in q["questions"]] == [7, 8]
    ann = a["annotations"][0]
    assert ann["question_type"] == "none of the above"
    assert ann["multiple_choice_answer"] == "dog"
    assert ann["answers"][0] == {
        "answer": "dog", "answer_confidence": "yes", "answer_id": 1,
    }
    assert ann["answers"][9]["answer_id"] == 10


def test_vizwiz_schema():
    raw = [
        {"image": "VizWiz_val_00000000.jpg", "question": "what?",
         "answers": [{"answer": "unanswerable",
                      "answer_confidence": "yes"}] * 10,
         "answer_type": "unanswerable", "answerable": 0},
        {"image": "VizWiz_val_00000001.jpg", "question": "brand?",
         "answers": [{"answer": "acme", "answer_confidence": "maybe"}],
         "answer_type": "other", "answerable": 1},
    ]
    q, a = convert_vizwiz(raw)
    assert [x["question_id"] for x in q["questions"]] == [0, 1]
    assert q["questions"][0]["image_id"] == "VizWiz_val_00000000.jpg"
    assert a["annotations"][1]["question_type"] == "other"
    assert a["annotations"][0]["multiple_choice_answer"] == "unanswerable"
    # vizwiz answers pass through verbatim (no answer_id in the raw)
    assert a["annotations"][0]["answers"][0] == {
        "answer": "unanswerable", "answer_confidence": "yes",
    }


def test_test_split_has_no_annotations():
    q, a = convert_vizwiz(
        [{"image": "VizWiz_test_00000000.jpg", "question": "x?"}]
    )
    assert a is None and len(q["questions"]) == 1


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize(
    "path,kind",
    [
        ("textvqa/val_questions_vqa_format.json", "q"),
        ("textvqa/val_annotations_vqa_format.json", "a"),
        ("vizwiz/val_questions_vqa_format.json", "q"),
        ("vizwiz/val_annotations_vqa_format.json", "a"),
    ],
)
def test_keys_match_reference_files(path, kind):
    with open(os.path.join(REF, path)) as f:
        ref = json.load(f)
    if kind == "q":
        entry = ref["questions"][0]
        assert set(entry) == {"question", "image_id", "question_id"}
    else:
        entry = ref["annotations"][0]
        assert set(entry) == {
            "question_id", "image_id", "question_type", "answers",
            "multiple_choice_answer",
        }
        assert entry["multiple_choice_answer"] == \
            entry["answers"][0]["answer"]
        ans = entry["answers"][0]
        if "textvqa" in path:
            assert set(ans) == {"answer", "answer_confidence", "answer_id"}
        else:
            assert set(ans) == {"answer", "answer_confidence"}
