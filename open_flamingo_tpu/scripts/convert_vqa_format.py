"""Regenerate the TextVQA / VizWiz "VQA-format" eval annotations.

The reference vendors ~14.6 MB of converted annotation JSONs at
open_flamingo/eval/data/{textvqa,vizwiz}/*_vqa_format.json and treats
them as the only correct eval inputs (eval/README.md "custom
annotations"). Rather than vendoring the data, this script regenerates
byte-compatible files from the official raw releases:

  * TextVQA: TextVQA_0.5.1_train.json / TextVQA_0.5.1_val.json
    (https://textvqa.org/dataset/) — {"data": [{question, image_id,
    question_id, answers...}]}
  * VizWiz:  Annotations/{train,val,test}.json
    (https://vizwiz.org/tasks-and-datasets/vqa/) — a list of
    {"image", "question", "answers": [{answer, answer_confidence}],
    "answer_type", ...}

Output schema (matches the reference files field-for-field):
  questions:   {"questions": [{question, image_id, question_id}]}
  annotations: {"annotations": [{question_id, image_id, question_type,
                answers: [...]}]}
with TextVQA answers carrying {answer, answer_confidence: "yes",
answer_id: 1-based} and question_type "none of the above" (the raw
release has no type field), and VizWiz keeping the raw answer dicts,
question_id = list index, image_id = image filename, question_type =
the raw answer_type. `multiple_choice_answer` = answers[0].answer
(verified exact on all 9,319 reference val annotations).

Usage:
  python -m open_flamingo_tpu.scripts.convert_vqa_format textvqa \
      TextVQA_0.5.1_train.json out/train_questions_vqa_format.json \
      [out/train_annotations_vqa_format.json]
  python -m open_flamingo_tpu.scripts.convert_vqa_format vizwiz \
      Annotations/val.json out/val_questions_vqa_format.json \
      [out/val_annotations_vqa_format.json]

Annotations output is optional (the test splits have no answers).
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List, Optional, Tuple


def convert_textvqa(raw: Dict[str, Any]) -> Tuple[Dict, Optional[Dict]]:
    questions: List[Dict] = []
    annotations: List[Dict] = []
    has_answers = False
    for item in raw["data"]:
        questions.append(
            {
                "question": item["question"],
                "image_id": item["image_id"],
                "question_id": item["question_id"],
            }
        )
        answers = item.get("answers")
        if answers:
            has_answers = True
            annotations.append(
                {
                    "question_id": item["question_id"],
                    "image_id": item["image_id"],
                    "question_type": "none of the above",
                    "multiple_choice_answer": answers[0],
                    "answers": [
                        {
                            "answer": a,
                            "answer_confidence": "yes",
                            "answer_id": i + 1,
                        }
                        for i, a in enumerate(answers)
                    ],
                }
            )
    return (
        {"questions": questions},
        {"annotations": annotations} if has_answers else None,
    )


def convert_vizwiz(raw: List[Dict[str, Any]]) -> Tuple[Dict, Optional[Dict]]:
    questions: List[Dict] = []
    annotations: List[Dict] = []
    has_answers = False
    for qid, item in enumerate(raw):
        questions.append(
            {
                "question": item["question"],
                "image_id": item["image"],
                "question_id": qid,
            }
        )
        answers = item.get("answers")
        if answers:
            has_answers = True
            annotations.append(
                {
                    "question_id": qid,
                    "image_id": item["image"],
                    "question_type": item.get(
                        "answer_type", "none of the above"
                    ),
                    "multiple_choice_answer": answers[0]["answer"],
                    "answers": answers,
                }
            )
    return (
        {"questions": questions},
        {"annotations": annotations} if has_answers else None,
    )


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("dataset", choices=["textvqa", "vizwiz"])
    p.add_argument("raw_json")
    p.add_argument("questions_out")
    p.add_argument("annotations_out", nargs="?", default=None)
    args = p.parse_args(argv)

    with open(args.raw_json) as f:
        raw = json.load(f)
    conv = convert_textvqa if args.dataset == "textvqa" else convert_vizwiz
    questions, annotations = conv(raw)
    with open(args.questions_out, "w") as f:
        json.dump(questions, f)
    print(f"wrote {len(questions['questions'])} questions -> "
          f"{args.questions_out}")
    if args.annotations_out:
        if annotations is None:
            raise SystemExit(
                "raw file carries no answers (test split?) — omit the "
                "annotations output"
            )
        with open(args.annotations_out, "w") as f:
            json.dump(annotations, f)
        print(f"wrote {len(annotations['annotations'])} annotations -> "
              f"{args.annotations_out}")


if __name__ == "__main__":
    main()
