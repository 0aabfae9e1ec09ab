"""Eval-model adapter registry (parity with open_flamingo/eval/models/):
dynamic dispatch by --model name (evaluate.py:394-400)."""


def get_eval_model(name: str, **kwargs):
    if name == "open_flamingo":
        from ..eval_model import OpenFlamingoEvalModel

        return OpenFlamingoEvalModel(**kwargs)
    if name == "blip":
        from .blip import BLIPEvalModel

        return BLIPEvalModel(**kwargs)
    raise ValueError(f"unknown eval model {name!r}")
