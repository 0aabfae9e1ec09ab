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


def test_ptb_tokenizer_golden():
    """PTB-tokenizer semantics CIDEr depends on (pycocoevalcap
    ptbtokenizer.py): clitic splits, hyphenated compounds kept whole,
    punctuation tokens dropped."""
    from open_flamingo_tpu.eval.metrics.cider import tokenize

    assert tokenize("A well-known dog doesn't run.") == [
        "a", "well-known", "dog", "does", "n't", "run",
    ]
    assert tokenize("the dog's toy, isn't it?") == [
        "the", "dog", "'s", "toy", "is", "n't", "it",
    ]
    assert tokenize("I'm sure they're 2.5 m tall...") == [
        "i", "'m", "sure", "they", "'re", "2", "5", "m", "tall",
    ]
    assert tokenize("red - blue -- green") == ["red", "blue", "green"]
    assert tokenize("we'll we've we'd") == [
        "we", "'ll", "we", "'ve", "we", "'d",
    ]


def test_cider_golden_values():
    """Analytic CIDEr-D values (Vedantam et al. 2015 / pycocoevalcap
    cider_scorer.py semantics). Perfect match with df=1 everywhere gives
    val=1 per n -> 10.0; sentences shorter than n leave that n at 0."""
    # 5-gram-free perfect match: length 5 fills n=1..4 -> exactly 10
    refs = {
        "1": ["a b c d e"],
        "2": ["v w x y z"],
    }
    cands = {"1": "a b c d e", "2": "v w x y z"}
    np.testing.assert_allclose(cider_d(cands, refs), 10.0, atol=1e-12)

    # length-2 perfect match: only n=1,2 populated -> 10 * 2/4 = 5
    refs2 = {"1": ["a b"], "2": ["c d"]}
    cands2 = {"1": "a b", "2": "c d"}
    np.testing.assert_allclose(cider_d(cands2, refs2), 5.0, atol=1e-12)

    # disjoint vocab -> 0
    cands3 = {"1": "q r s t", "2": "m n o p"}
    np.testing.assert_allclose(cider_d(cands3, refs), 0.0, atol=1e-12)

    # hand-computed partial overlap with length gaussian:
    # cand "a b" vs ref "a b c d e": unigram overlap {a,b} (df=1 each,
    # idf=log2); clip min(w_c,w_r)=log2^2 * 2 terms; norms: cand sqrt(2)
    # log2, ref sqrt(5) log2 -> val1 = 2/(sqrt(2)sqrt(5));
    # bigram: {ab} -> 1/(1*2) ... norms: cand 1 ngram (log2), ref 4
    # ngrams (2 log2) -> val2 = log2^2/(log2*2log2) = 1/2;
    # n=3: cand has no 3-grams -> 0; n=4 -> 0.
    # gaussian: delta=2-5=-3 -> exp(-9/72); score = 10 * g *
    # (val1+val2)/4
    import math

    refs4 = {"1": ["a b c d e"], "2": ["v w x y z"]}
    cands4 = {"1": "a b", "2": "v w x y z"}
    g = math.exp(-9.0 / (2 * 36.0))
    val1 = 2.0 / (math.sqrt(2) * math.sqrt(5))
    val2 = 0.5
    want_1 = 10.0 * g * (val1 + val2) / 4.0
    want = (want_1 + 10.0) / 2.0
    np.testing.assert_allclose(cider_d(cands4, refs4), want, rtol=1e-12)


def test_ok_vqa_stemmer_golden():
    """Golden values mirroring OKVQAStemmer (ok_vqa_utils.py:187-208):
    manual table wins, -ing takes the verb lemma, plural nouns
    singularize per the inflection rule list."""
    from open_flamingo_tpu.eval.metrics.ok_vqa_stem import (
        postprocess_ok_vqa_generation,
        singularize,
        stem_answer,
    )

    # manual-override table entries (verbatim task data)
    assert stem_answer("riding") == "ride"
    assert stem_answer("clothes") == "cloth"
    assert stem_answer("christmas") == "christmas"
    assert stem_answer("firefighters") == "firefight"
    assert stem_answer("men's") == "men"
    assert stem_answer("dangerous") == "danger"
    assert stem_answer("buildings") == "build"
    # -ing -> wordnet verb lemma
    assert stem_answer("running") == "run"
    assert stem_answer("sitting") == "sit"
    assert stem_answer("making") == "make"
    assert stem_answer("eating") == "eat"
    assert stem_answer("surfing") == "surf"
    assert stem_answer("skiing") == "ski"
    # NNS -> inflection.singularize
    assert stem_answer("dogs") == "dog"
    assert stem_answer("buses") == "bus"
    assert stem_answer("boxes") == "box"
    assert stem_answer("knives") == "knife"
    assert stem_answer("wolves") == "wolf"
    assert stem_answer("children") == "child"
    assert stem_answer("people") == "person"
    assert stem_answer("mice") == "mouse"
    # not plural nouns: unchanged
    assert stem_answer("is") == "is"
    assert stem_answer("glass") == "glass"
    assert stem_answer("famous") == "famous"
    # inflection rule-list spot checks
    assert singularize("matrices") == "matrix"
    assert singularize("statuses") == "status"
    assert singularize("movies") == "movie"
    assert singularize("series") == "series"
    # multi-word + the postprocess split
    assert stem_answer("riding horses") == "ride horse"
    assert (
        postprocess_ok_vqa_generation("riding horses, maybe Question junk")
        == "ride horse"
    )


def test_roc_auc():
    labels = [1, 1, 0, 0]
    scores = [0.9, 0.8, 0.2, 0.1]
    assert roc_auc(labels, scores) == 1.0
    assert roc_auc(labels, [0.1, 0.2, 0.8, 0.9]) == 0.0
    assert abs(roc_auc([1, 0], [0.5, 0.5]) - 0.5) < 1e-9


def test_ok_vqa_stemmer_non_override_corpus():
    """VERDICT r2 #7: bound the stemmer's divergence from the official
    nltk+inflection pipeline on words OUTSIDE the manual-override table.
    Expected values are the official pipeline's outputs: -ing words get
    WordNet verb lemmas (doubling via verb.exc, ing->e via the lexicon,
    non-verb -ing nouns pass through unchanged), NNS plurals get
    inflection.singularize."""
    from open_flamingo_tpu.eval.metrics.ok_vqa_stem import stem_answer

    golden = {
        # -ing -> plain stem (ing -> "")
        "walking": "walk", "standing": "stand", "jumping": "jump",
        "sleeping": "sleep", "cooking": "cook", "playing": "play",
        "reading": "read", "fishing": "fish", "drinking": "drink",
        "snowboarding": "snowboard", "skateboarding": "skateboard",
        "bowling": "bowl", "boxing": "box", "grilling": "grill",
        "surfboarding": "surfboard", "talking": "talk",
        "painting": "paint", "drawing": "draw", "throwing": "throw",
        "catching": "catch", "kicking": "kick", "climbing": "climb",
        "laughing": "laugh", "singing": "sing", "feeding": "feed",
        # -ing with consonant doubling (WordNet verb.exc entries)
        "swimming": "swim", "shopping": "shop", "jogging": "jog",
        "cutting": "cut", "spinning": "spin", "clapping": "clap",
        "petting": "pet", "batting": "bat", "grabbing": "grab",
        # -ing -> e-final base (WordNet lexicon ing->e)
        "waving": "wave", "smiling": "smile", "skating": "skate",
        "racing": "race", "baking": "bake", "hiking": "hike",
        "biking": "bike", "typing": "type", "juggling": "juggle",
        "whistling": "whistle", "skiing": "ski", "dancing": "dance",
        "sliding": "slide", "diving": "dive", "gliding": "glide",
        # -ing nouns with no verb lemma: official pipeline keeps them
        "ceiling": "ceiling", "evening": "evening", "sibling": "sibling",
        "duckling": "duckling", "lightning": "lightning",
        "inning": "inning", "stocking": "stocking",
        "herring": "herring", "dumpling": "dumpling",
        # NNS plurals -> inflection.singularize
        "dogs": "dog", "cats": "cat", "horses": "horse",
        "benches": "bench", "knives": "knife", "babies": "baby",
        "pizzas": "pizza", "carrots": "carrot", "glasses": "glass",
        "boxes": "box", "wolves": "wolf", "cherries": "cherry",
        "shoes": "shoe", "buses": "bus", "watches": "watch",
        # words the official pipeline leaves alone
        "tennis": "tennis", "grass": "grass", "chess": "chess",
        "delicious": "delicious", "red": "red", "two": "two",
    }
    diverged = {
        w: (stem_answer(w), want)
        for w, want in golden.items()
        if stem_answer(w) != want
    }
    assert not diverged, diverged
