"""Eval harness utilities (parity with open_flamingo/eval/utils.py)."""

from __future__ import annotations

import random
import numpy as np


def random_seed(seed: int = 42, rank: int = 0):
    np.random.seed(seed + rank)
    random.seed(seed + rank)


def compute_effective_num_shots(num_shots: int, model_type: str = "open_flamingo"):
    """0-shot runs still prepend 2 text-only demos (utils.py:24-31)."""
    if model_type == "open_flamingo":
        return num_shots if num_shots > 0 else 2
    return num_shots


def sample_batch_demos_from_query_set(query_set, num_samples: int, batch_size: int):
    """Random demos per batch item (utils.py:34-46)."""
    return [
        [query_set[i] for i in random.sample(range(len(query_set)), num_samples)]
        for _ in range(batch_size)
    ]


def get_query_set(train_dataset, query_set_size: int):
    idx = np.random.choice(
        len(train_dataset), min(query_set_size, len(train_dataset)), replace=False
    )
    return [train_dataset[int(i)] for i in idx]


def prepare_eval_samples(test_dataset, num_samples: int, batch_size: int, rank: int = 0,
                         world_size: int = 1):
    """Random subset + rank sharding + batching (utils.py:49-62)."""
    n = len(test_dataset)
    num_samples = min(num_samples, n) if num_samples > 0 else n
    idx = np.random.choice(n, num_samples, replace=False)
    idx = idx[rank::world_size]
    batches = []
    for s in range(0, len(idx), batch_size):
        batches.append([test_dataset[int(i)] for i in idx[s : s + batch_size]])
    return batches


def get_predicted_classnames(logprobs: np.ndarray, k: int, class_id_to_name):
    """Top-k classnames per row from a (B, C) logprob matrix
    (utils.py:88-105)."""
    topk = np.argsort(-logprobs, axis=1)[:, :k]
    names = [[class_id_to_name[int(c)] for c in row] for row in topk]
    return names, topk
