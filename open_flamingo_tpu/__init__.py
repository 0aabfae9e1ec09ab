"""open_flamingo_tpu: TPU-native multimodal (Flamingo-style) framework.

JAX/Flax/XLA/Pallas re-design with the capabilities of
mlfoundations/open_flamingo (frozen ViT + frozen LM bridged by a trainable
PerceiverResampler and gated cross-attention), built TPU-first: SPMD over
device meshes, functional transforms, explicit KV-cache pytrees.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API so importing the package stays cheap and partial
    # builds remain importable.
    if name == "create_model_and_transforms":
        from .factory import create_model_and_transforms

        return create_model_and_transforms
    if name in ("Flamingo", "FlamingoConfig"):
        from .models import flamingo

        return getattr(flamingo, name)
    raise AttributeError(name)
