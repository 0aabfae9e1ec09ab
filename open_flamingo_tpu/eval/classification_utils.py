"""Classification benchmark metadata (parity with
open_flamingo/eval/classification_utils.py): the 1000 OpenAI-CLIP
ImageNet classnames (stored as data in data/imagenet_classnames.json)
and the HatefulMemes label names."""

from __future__ import annotations

import json
import os

_HERE = os.path.dirname(__file__)

with open(os.path.join(_HERE, "data", "imagenet_classnames.json")) as _f:
    IMAGENET_CLASSNAMES = json.load(_f)

IMAGENET_1K_CLASS_ID_TO_LABEL = dict(enumerate(IMAGENET_CLASSNAMES))

HM_CLASSNAMES = ["no", "yes"]
HM_CLASS_ID_TO_LABEL = {0: "no", 1: "yes"}
