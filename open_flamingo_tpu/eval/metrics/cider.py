"""CIDEr-D metric, self-contained.

The reference scores captions with pycocoevalcap's COCOEvalCap
(open_flamingo/eval/coco_metric.py:5-18); that package (and its Java PTB
tokenizer) is not available here, so this is a from-the-paper
implementation of CIDEr-D (Vedantam et al., CVPR 2015): n in 1..4,
tf-idf with idf = log(N) - log(max(1, df)), candidate-count clipping,
length gaussian (sigma 6), x10 scaling, mean over n, mean over refs,
mean over images.

`tokenize` reproduces the PTB-tokenizer behavior CIDEr depends on
(pycocoevalcap/tokenizer: Stanford PTBTokenizer + punctuation-token
removal): lowercase; clitic splitting (don't -> do n't, dog's -> dog 's);
hyphenated compounds stay ONE token; punctuation becomes standalone
tokens which are then dropped (the PUNCTUATIONS list in
ptbtokenizer.py). The previous regex tokenizer split hyphenated words
and mangled contractions, changing n-gram statistics.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

SIGMA = 6.0
MAX_N = 4

# pycocoevalcap ptbtokenizer.py PUNCTUATIONS (lowercased)
_PUNCTUATIONS = {
    "''", "'", "``", "`", "-lrb-", "-rrb-", "-lcb-", "-rcb-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
    # PTBTokenizer NORMALIZES brackets to -LRB-/-RRB-/-LCB-/-RCB-
    # before pycocoevalcap drops them — raw brackets must go too
    # (round-5 fixture cross-check caught "(" surviving)
    "(", ")", "[", "]", "{", "}",
}

# punctuation the PTB tokenizer separates from words (keeps word-internal
# hyphens and apostrophes intact; clitics handled separately)
_SEP_PUNCT = re.compile(r"([;@#$%&*()\[\]{}\"<>/\\|=+^~_.,:?!])")


def tokenize(s: str) -> List[str]:
    s = s.lower().strip()
    s = s.replace("...", " ... ")
    s = re.sub(r"--+", " -- ", s)
    s = _SEP_PUNCT.sub(r" \1 ", s)
    # quote marks separate from words BEFORE clitic handling (PTB emits
    # ``/''/`/' tokens, all on the drop list); word-internal
    # apostrophes (clitics, o'clock) stay attached for the clitic rules
    s = re.sub(r"(``|`)", r" \1 ", s)
    s = re.sub(r"''", r" '' ", s)
    s = re.sub(r"(^|\s)'(?=[a-z0-9])", r"\1 ' ", s)
    s = re.sub(r"([a-z0-9])'(\s|$)", r"\1 ' \2", s)
    # PTB clitics: n't and 's/'m/'d/'ll/'re/'ve split off their host word
    s = re.sub(r"([a-z])n't\b", r"\1 n't", s)
    s = re.sub(r"([a-z])'(s|m|d|ll|re|ve)\b", r"\1 '\2", s)
    # a standalone hyphen between spaces is a punctuation token
    s = re.sub(r"(^| )-( |$)", r"\1 - \2", s)
    return [t for t in s.split() if t not in _PUNCTUATIONS]


def _ngram_counts(tokens: Sequence[str]) -> List[Counter]:
    out = []
    for n in range(1, MAX_N + 1):
        out.append(
            Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))
        )
    return out


def cider_d(
    candidates: Dict[str, str],
    references: Dict[str, List[str]],
) -> float:
    """candidates: image_id -> caption; references: image_id -> captions.
    Returns corpus CIDEr-D in [0, 10] (callers usually report x100/…)."""
    ids = list(candidates.keys())
    assert all(i in references for i in ids)

    cand_counts = {i: _ngram_counts(tokenize(candidates[i])) for i in ids}
    ref_counts = {
        i: [_ngram_counts(tokenize(r)) for r in references[i]] for i in ids
    }

    # document frequency over reference sets (per image, per distinct ngram)
    df: List[Dict[tuple, int]] = [defaultdict(int) for _ in range(MAX_N)]
    for i in ids:
        for n in range(MAX_N):
            seen = set()
            for rc in ref_counts[i]:
                seen.update(rc[n].keys())
            for g in seen:
                df[n][g] += 1
    log_n = math.log(max(len(ids), 1))

    def vec_norm_len(counts: List[Counter]):
        vecs, norms = [], []
        for n in range(MAX_N):
            v = {}
            norm = 0.0
            for g, tf in counts[n].items():
                idf = log_n - math.log(max(1.0, df[n][g]))
                w = tf * idf
                v[g] = w
                norm += w * w
            vecs.append(v)
            norms.append(math.sqrt(norm))
        length = sum(counts[0].values())
        return vecs, norms, length

    total = 0.0
    for i in ids:
        c_vec, c_norm, c_len = vec_norm_len(cand_counts[i])
        score_i = 0.0
        for rc in ref_counts[i]:
            r_vec, r_norm, r_len = vec_norm_len(rc)
            delta = float(c_len - r_len)
            sim = 0.0
            for n in range(MAX_N):
                val = 0.0
                for g, w in c_vec[n].items():
                    if g in r_vec[n]:
                        # CIDEr-D: clip candidate weight to reference weight
                        val += min(w, r_vec[n][g]) * r_vec[n][g]
                if c_norm[n] > 0 and r_norm[n] > 0:
                    val /= c_norm[n] * r_norm[n]
                val *= math.exp(-(delta**2) / (2 * SIGMA**2))
                sim += val
            score_i += sim / MAX_N
        total += 10.0 * score_i / max(len(ref_counts[i]), 1)
    return total / max(len(ids), 1)


def compute_cider(result_path_or_list, annotations_path_or_dict) -> float:
    """COCO-format entry point mirroring coco_metric.compute_cider:
    results [{image_id, caption}], annotations {'annotations':
    [{image_id, caption}]}. Returns CIDEr (x1; harness multiplies 100)."""
    import json

    results = result_path_or_list
    if isinstance(results, str):
        with open(results) as f:
            results = json.load(f)
    anns = annotations_path_or_dict
    if isinstance(anns, str):
        with open(anns) as f:
            anns = json.load(f)

    references: Dict[str, List[str]] = defaultdict(list)
    for a in anns["annotations"]:
        references[str(a["image_id"])].append(a["caption"])
    candidates = {str(r["image_id"]): r["caption"] for r in results}
    candidates = {k: v for k, v in candidates.items() if k in references}
    return cider_d(candidates, dict(references))
