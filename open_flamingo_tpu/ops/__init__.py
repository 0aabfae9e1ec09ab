from .attention import self_attention  # noqa: F401
