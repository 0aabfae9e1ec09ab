"""Precompute + cache RICES demo-pool vision features to .npy files.

Parity with open_flamingo/scripts/cache_rices_features.py (which pickles
torch tensors); our cache is a plain .npy of unit-norm features consumed
by eval.rices.RICES(cached_features=...).
"""

from __future__ import annotations

import argparse
import os



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--vision_encoder_path", default="ViT-B-32")
    p.add_argument("--vision_encoder_pretrained", default="openai",
                   help="local .pt/HF-dir weights for the retrieval encoder")
    p.add_argument("--lm_path", default="mosaicml/mpt-1b-redpajama-200b")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--dataset_name", required=True,
                   choices=["coco", "flickr", "vqav2", "ok_vqa", "vizwiz",
                            "textvqa", "imagenet", "hateful_memes"])
    # dataset paths (subset used depending on dataset_name)
    p.add_argument("--image_dir_path", default=None)
    p.add_argument("--val_image_dir_path", default=None)
    p.add_argument("--karpathy_json_path", default=None)
    p.add_argument("--questions_json_path", default=None)
    p.add_argument("--annotations_json_path", default=None)
    p.add_argument("--imagenet_root", default=None)
    args = p.parse_args(argv)

    from ..eval.rices import RICES, create_retrieval_encoder
    from ..eval import eval_datasets as D

    encoder = create_retrieval_encoder(
        args.vision_encoder_path, args.vision_encoder_pretrained
    )

    if args.dataset_name in ("coco", "flickr"):
        ds = D.CaptionDataset(
            args.image_dir_path, args.karpathy_json_path, True,
            args.dataset_name, args.val_image_dir_path,
        )
    elif args.dataset_name in ("vqav2", "ok_vqa", "vizwiz", "textvqa"):
        ds = D.VQADataset(
            args.image_dir_path, args.questions_json_path,
            args.annotations_json_path, True, args.dataset_name,
        )
    elif args.dataset_name == "imagenet":
        ds = D.ImageNetDataset(args.imagenet_root)
    else:
        ds = D.HatefulMemesDataset(
            args.image_dir_path, args.annotations_json_path
        )

    rices = RICES(ds, encoder, batch_size=args.batch_size)
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, f"{args.dataset_name}.npy")
    rices.save_features(out)
    print(f"wrote {out}: {rices.features.shape}")


if __name__ == "__main__":
    main()
