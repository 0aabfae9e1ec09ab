"""Fill VQA test-dev result files with every question id so EvalAI accepts
them (parity with open_flamingo/scripts/fill_vqa_testdev_results.py)."""

from __future__ import annotations

import argparse
import json

from ..eval.metrics.vqa_accuracy import fill_testdev_results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_path", required=True)
    p.add_argument("--questions_path", required=True,
                   help="test / test-dev questions json")
    p.add_argument("--output_path", required=True)
    p.add_argument("--fill_answer", default="")
    args = p.parse_args(argv)

    with open(args.results_path) as f:
        results = json.load(f)
    with open(args.questions_path) as f:
        qids = [q["question_id"] for q in json.load(f)["questions"]]
    filled = fill_testdev_results(results, qids, args.fill_answer)
    with open(args.output_path, "w") as f:
        json.dump(filled, f)
    print(f"{len(results)} -> {len(filled)} entries")


if __name__ == "__main__":
    main()
