from .cider import cider_d, compute_cider  # noqa: F401
from .ok_vqa_stem import postprocess_ok_vqa_generation  # noqa: F401
from .vqa_accuracy import (  # noqa: F401
    compute_vqa_accuracy,
    fill_testdev_results,
    postprocess_vqa_generation,
    vqa_accuracy,
)


def postprocess_captioning_generation(prediction: str) -> str:
    """Mirror of coco_metric.py:21-22: truncate at 'Output'."""
    return prediction.split("Output", 1)[0]


def roc_auc(labels, scores) -> float:
    """ROC-AUC via the rank statistic (HatefulMemes metric,
    evaluate.py:1281-1297 uses sklearn; equivalent closed form)."""
    import numpy as np

    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    # average rank of positives (ties get 0.5 credit)
    greater = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return float((greater + 0.5 * ties) / (len(pos) * len(neg)))
