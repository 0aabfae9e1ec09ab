"""Official VQA accuracy (antonio torralba lab protocol), self-contained.

The reference vendors the official VQA api/VQAEval
(open_flamingo/eval/vqa_metric.py): accuracy of answer a against 10 human
answers = min(#matches/3, 1), averaged over the 10 leave-one-out subsets,
after contraction/punctuation/digit/article normalization. This module
implements those semantics (the normalization tables are the official
task data) plus the test-dev result-file path used when annotations are
absent (vqa_metric.py:555+, fill_vqa_testdev_results.py).
"""

from __future__ import annotations

import json
import re
from typing import Dict, List

CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "couldn'tve": "couldn't've",
    "couldnt've": "couldn't've", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hadnt've": "hadn't've",
    "hadn'tve": "hadn't've", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's",
    "Id've": "I'd've", "I'dve": "I'd've", "Im": "I'm", "Ive": "I've",
    "isnt": "isn't", "itd": "it'd", "itd've": "it'd've", "it'dve": "it'd've",
    "itll": "it'll", "let's": "let's", "maam": "ma'am",
    "mightnt": "mightn't", "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've", "mightve": "might've", "mustnt": "mustn't",
    "mustve": "must've", "neednt": "needn't", "notve": "not've",
    "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at",
    "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd",
    "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're", "theres": "there's",
    "theyd": "they'd", "theyd've": "they'd've", "they'dve": "they'd've",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "twas": "'twas", "wasnt": "wasn't", "wed've": "we'd've",
    "we'dve": "we'd've", "weve": "we've", "werent": "weren't",
    "whatll": "what'll", "whatre": "what're", "whats": "what's",
    "whatve": "what've", "whens": "when's", "whered": "where'd",
    "wheres": "where's", "whereve": "where've", "whod": "who'd",
    "whod've": "who'd've", "who'dve": "who'd've", "wholl": "who'll",
    "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've", "wouldn'tve": "wouldn't've",
    "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll",
    "yall'd've": "y'all'd've", "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've",
    "you'dve": "you'd've", "youll": "you'll", "youre": "you're",
    "youve": "you've",
}

MANUAL_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
ARTICLES = ["a", "an", "the"]

_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
_COMMA_STRIP = re.compile(r"(\d)(,)(\d)")
PUNCT = [
    ";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\", "_", "-",
    ">", "<", "@", "`", ",", "?", "!",
]


def process_punctuation(text: str) -> str:
    out = text
    for p in PUNCT:
        if (p + " " in text or " " + p in text) or (
            re.search(_COMMA_STRIP, text) is not None
        ):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    out = _PERIOD_STRIP.sub("", out, re.UNICODE)
    return out


def process_digit_article(text: str) -> str:
    out = []
    for word in text.lower().split():
        word = MANUAL_MAP.get(word, word)
        if word not in ARTICLES:
            out.append(word)
    for i, word in enumerate(out):
        if word in CONTRACTIONS:
            out[i] = CONTRACTIONS[word]
    return " ".join(out)


def normalize_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip()
    ans = process_punctuation(ans)
    ans = process_digit_article(ans)
    return ans


def vqa_accuracy(pred: str, gt_answers: List[str]) -> float:
    """min(matches/3, 1) averaged over the leave-one-out subsets of the
    (typically 10) ground-truth answers."""
    # official protocol: normalize only when answers disagree
    gts = [a.replace("\n", " ").replace("\t", " ").strip() for a in gt_answers]
    pred = pred.replace("\n", " ").replace("\t", " ").strip()
    if len(set(gts)) > 1:
        gts = [normalize_answer(a) for a in gts]
        pred = normalize_answer(pred)
    accs = []
    for i in range(len(gts)):
        others = gts[:i] + gts[i + 1:]
        matches = sum(1 for a in others if a == pred)
        accs.append(min(1.0, matches / 3.0))
    return sum(accs) / max(len(accs), 1)


def compute_vqa_accuracy(
    result_json_path: str,
    question_json_path: str,
    annotation_json_path: str,
) -> float:
    """File-based entry point mirroring vqa_metric.compute_vqa_accuracy
    (vqa_metric.py:527-554): results [{question_id, answer}]. Returns
    accuracy in [0, 100]."""
    with open(result_json_path) as f:
        results = json.load(f)
    with open(annotation_json_path) as f:
        annotations = json.load(f)["annotations"]
    by_qid = {a["question_id"]: a for a in annotations}

    total, n = 0.0, 0
    for r in results:
        ann = by_qid.get(r["question_id"])
        if ann is None:
            continue
        gt = [a["answer"] for a in ann["answers"]]
        total += vqa_accuracy(r["answer"], gt)
        n += 1
    return 100.0 * total / max(n, 1)


def postprocess_vqa_generation(prediction: str) -> str:
    """Split on Question/Answer/Short and trailing comma
    (vqa_metric.py:557-560)."""
    answer = re.split("Question|Answer|Short", prediction, 1)[0]
    answer = re.split(", ", answer, 1)[0]
    return answer


def fill_testdev_results(
    results: List[Dict],
    all_question_ids: List,
    fill_answer: str = "",
) -> List[Dict]:
    """EvalAI test-dev files must contain every question id
    (scripts/fill_vqa_testdev_results.py:21-142)."""
    have = {r["question_id"] for r in results}
    out = list(results)
    for qid in all_question_ids:
        if qid not in have:
            out.append({"question_id": qid, "answer": fill_answer})
    return out
