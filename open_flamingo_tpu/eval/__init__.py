from .eval_model import BaseEvalModel, OpenFlamingoEvalModel  # noqa: F401
