from .wds import (  # noqa: F401
    DataInfo,
    PrefetchLoader,
    ProcessPrefetchLoader,
    SharedEpoch,
    braceexpand,
    detshuffle,
    resampled_shards,
    shuffle_buffer,
    split_shards,
    tar_samples,
)


def get_data(config, image_processor, tokenizer, dataset_type: str, epoch: int = 0):
    """Dispatch mirroring open_flamingo/train/data.py:486-499."""
    if dataset_type in ("image_text", "laion"):
        from .laion import get_laion_dataset

        return get_laion_dataset(config, image_processor, tokenizer, epoch)
    if dataset_type in ("mmc4", "interleaved"):
        from .mmc4 import get_mmc4_dataset

        return get_mmc4_dataset(config, image_processor, tokenizer, epoch)
    raise ValueError(f"unknown dataset type {dataset_type}")
