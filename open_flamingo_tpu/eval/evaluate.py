"""Benchmark eval driver.

Parity with open_flamingo/eval/evaluate.py: three generic evaluators
(captioning, VQA, rank classification) over 8 benchmarks, shots x trials
sweeps with mean/stddev aggregation, random query sets or RICES demo
retrieval, 0-shot -> 2 text-only demos with <image> stripped
(evaluate.py:837-839), multi-host prediction gather, results json.
"""

from __future__ import annotations

import argparse
import json
import uuid
from collections import defaultdict
from typing import List, Optional

import numpy as np

from .eval_model import BaseEvalModel
from .metrics import (
    compute_cider,
    postprocess_captioning_generation,
    postprocess_ok_vqa_generation,
    postprocess_vqa_generation,
    roc_auc,
    vqa_accuracy,
)
from .utils import (
    compute_effective_num_shots,
    get_predicted_classnames,
    get_query_set,
    prepare_eval_samples,
    random_seed,
    sample_batch_demos_from_query_set,
)


def _context_text(demos, make_prompt, effective_num_shots, num_shots) -> str:
    """Join demo prompts; 0-shot keeps text-only demos with <image>
    stripped (evaluate.py:830-841)."""
    texts = [make_prompt(d) for d in demos]
    ctx = "".join(texts)
    if num_shots == 0:
        ctx = ctx.replace("<image>", "")
    return ctx


def evaluate_captioning(
    eval_model: BaseEvalModel,
    train_dataset,
    test_dataset,
    *,
    seed: int = 42,
    max_generation_length: int = 20,
    num_beams: int = 3,
    length_penalty: float = 0.0,
    num_shots: int = 4,
    batch_size: int = 8,
    num_samples: int = -1,
    query_set_size: int = 2048,
    rices=None,
    dataset_name: str = "coco",
    rank: int = 0,
    world_size: int = 1,
    gather=None,
) -> Optional[float]:
    random_seed(seed, rank)
    effective = compute_effective_num_shots(num_shots)
    batches = prepare_eval_samples(
        test_dataset, num_samples, batch_size, rank, world_size
    )
    query_set = None if rices else get_query_set(train_dataset, query_set_size)

    predictions = {}
    for batch in batches:
        if rices:
            demos_per_item = rices.find([x["image"] for x in batch], effective)
        else:
            demos_per_item = sample_batch_demos_from_query_set(
                query_set, effective, len(batch)
            )
        batch_text, batch_images = [], []
        for item, demos in zip(batch, demos_per_item):
            ctx = _context_text(
                demos,
                lambda d: eval_model.get_caption_prompt(d["caption"].strip()),
                effective,
                num_shots,
            )
            batch_text.append(ctx + eval_model.get_caption_prompt())
            imgs = [d["image"] for d in demos] if num_shots > 0 else []
            batch_images.append(imgs + [item["image"]])
        outputs = eval_model.get_outputs(
            batch_text, batch_images,
            min_generation_length=0,
            max_generation_length=max_generation_length,
            num_beams=num_beams,
            length_penalty=length_penalty,
        )
        for item, out in zip(batch, outputs):
            predictions[item["image_id"]] = postprocess_captioning_generation(
                out
            ).replace('"', "")

    all_preds = (gather or (lambda x: [x]))(predictions)
    if rank != 0:
        return None
    merged = {}
    for p in all_preds:
        merged.update(p)
    results = [
        {"image_id": k, "caption": v} for k, v in merged.items()
    ]
    refs = defaultdict(list)
    for i in range(len(test_dataset)):
        ann = test_dataset.annotations[i]
        iid = ann["cocoid"] if dataset_name == "coco" else ann["imgid"]
        for s in ann["sentences"]:
            refs[iid].append(s["raw"])
    anns = {
        "annotations": [
            {"image_id": k, "caption": c} for k, v in refs.items() for c in v
        ]
    }
    return compute_cider(results, anns) * 100.0


def evaluate_vqa(
    eval_model: BaseEvalModel,
    train_dataset,
    test_dataset,
    *,
    seed: int = 42,
    max_generation_length: int = 5,
    num_beams: int = 3,
    length_penalty: float = 0.0,
    num_shots: int = 4,
    batch_size: int = 8,
    num_samples: int = -1,
    query_set_size: int = 2048,
    rices=None,
    dataset_name: str = "vqav2",
    rank: int = 0,
    world_size: int = 1,
    gather=None,
    results_path: Optional[str] = None,
) -> Optional[float]:
    random_seed(seed, rank)
    effective = compute_effective_num_shots(num_shots)
    batches = prepare_eval_samples(
        test_dataset, num_samples, batch_size, rank, world_size
    )
    query_set = None if rices else get_query_set(train_dataset, query_set_size)
    postprocess = (
        postprocess_ok_vqa_generation
        if dataset_name == "ok_vqa"
        else postprocess_vqa_generation
    )

    predictions = []
    for batch in batches:
        if rices:
            demos_per_item = rices.find([x["image"] for x in batch], effective)
        else:
            demos_per_item = sample_batch_demos_from_query_set(
                query_set, effective, len(batch)
            )
        batch_text, batch_images = [], []
        for item, demos in zip(batch, demos_per_item):
            ctx = _context_text(
                demos,
                lambda d: eval_model.get_vqa_prompt(
                    d["question"], d["answers"][0]
                ),
                effective,
                num_shots,
            )
            batch_text.append(
                ctx + eval_model.get_vqa_prompt(item["question"])
            )
            imgs = [d["image"] for d in demos] if num_shots > 0 else []
            batch_images.append(imgs + [item["image"]])
        outputs = eval_model.get_outputs(
            batch_text, batch_images,
            min_generation_length=0,
            max_generation_length=max_generation_length,
            num_beams=num_beams,
            length_penalty=length_penalty,
        )
        for item, out in zip(batch, outputs):
            predictions.append(
                {
                    "question_id": item["question_id"],
                    "answer": postprocess(out).strip().lower(),
                    "_answers": item.get("answers"),
                }
            )

    all_preds = (gather or (lambda x: [x]))(predictions)
    if rank != 0:
        return None
    merged = [p for sub in all_preds for p in sub]
    if results_path:
        with open(results_path, "w") as f:
            json.dump(
                [{k: v for k, v in p.items() if not k.startswith("_")} for p in merged],
                f,
            )
    if merged and merged[0].get("_answers") is None:
        return None  # test-dev style: results file only (evaluate.py:1081+)
    acc = [vqa_accuracy(p["answer"], p["_answers"]) for p in merged]
    return 100.0 * float(np.mean(acc)) if acc else None


def evaluate_classification(
    eval_model: BaseEvalModel,
    train_dataset,
    test_dataset,
    *,
    all_class_names: List[str],
    class_id_to_name,
    prompt_fn,              # (item, label_or_None) -> str
    seed: int = 42,
    num_shots: int = 4,
    batch_size: int = 8,
    num_samples: int = -1,
    query_set_size: int = 2048,
    rices=None,
    use_prompt_ensembling: bool = False,
    use_cache: bool = True,
    normalize_length: bool = True,
    metric: str = "accuracy",  # accuracy | roc_auc
    k: int = 5,
    rank: int = 0,
    world_size: int = 1,
    gather=None,
) -> Optional[float]:
    """Rank classification (evaluate.py:1118-1297): per class, score the
    log-likelihood of the classname tokens given the prompt; report top-k
    accuracy or ROC-AUC; optional prompt ensembling over demo
    permutations (evaluate.py:1208-1248)."""
    import itertools
    import math

    random_seed(seed, rank)
    effective = compute_effective_num_shots(num_shots)
    batches = prepare_eval_samples(
        test_dataset, num_samples, batch_size, rank, world_size
    )
    query_set = None if rices else get_query_set(train_dataset, query_set_size)

    records = []
    for batch in batches:
        if rices:
            demos_per_item = rices.find([x["image"] for x in batch], effective)
        else:
            demos_per_item = sample_batch_demos_from_query_set(
                query_set, effective, len(batch)
            )
        ensemble_logprobs = []
        n_perm = min(6, math.factorial(effective)) if use_prompt_ensembling else 1
        perms = itertools.permutations(range(effective))
        for pi in range(n_perm):
            order = list(next(perms))
            batch_text, batch_images = [], []
            for item, demos in zip(batch, demos_per_item):
                d = [demos[i] for i in order]
                ctx = _context_text(
                    d, lambda x: prompt_fn(x, x["class_name"]), effective, num_shots
                )
                batch_text.append(ctx + prompt_fn(item, None))
                imgs = [x["image"] for x in d] if num_shots > 0 else []
                batch_images.append(imgs + [item["image"]])
            lp = eval_model.get_rank_classifications(
                batch_text, batch_images, all_class_names,
                use_cache=use_cache, normalize_length=normalize_length,
            )
            ensemble_logprobs.append(lp)
        logprobs = np.mean(np.stack(ensemble_logprobs), axis=0)
        pred_names, topk = get_predicted_classnames(
            logprobs, k, class_id_to_name
        )
        for i, item in enumerate(batch):
            records.append(
                {
                    "id": item.get("id", item.get("image_id")),
                    "gt_id": item["class_id"],
                    "gt_name": item["class_name"],
                    "pred_ids": topk[i].tolist(),
                    "pred_name": pred_names[i][0],
                    "score_of_yes": float(
                        logprobs[i][all_class_names.index("yes")]
                    )
                    if "yes" in all_class_names
                    else None,
                }
            )

    all_recs = (gather or (lambda x: [x]))(records)
    if rank != 0:
        return None
    merged = [r for sub in all_recs for r in sub]
    if metric == "roc_auc":
        return 100.0 * roc_auc(
            [r["gt_id"] for r in merged],
            [r["score_of_yes"] for r in merged],
        )
    correct = sum(1 for r in merged if r["gt_id"] in r["pred_ids"][:1])
    return 100.0 * correct / max(len(merged), 1)


# ---------------------------------------------------------------------------


def build_parser():
    p = argparse.ArgumentParser("open_flamingo_tpu evaluate")
    p.add_argument("--model", default="open_flamingo")
    p.add_argument("--results_file", default=None)
    p.add_argument("--num_trials", type=int, default=1)
    p.add_argument("--trial_seeds", type=int, nargs="+", default=[42])
    p.add_argument("--shots", type=int, nargs="+", default=[0, 4, 8, 16, 32])
    p.add_argument("--num_samples", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--query_set_size", type=int, default=2048)
    p.add_argument("--rices", action="store_true")
    p.add_argument("--rices_vision_encoder_path", default="ViT-B-32",
                   help="separate CLIP encoder for retrieval "
                        "(evaluate.py:94-99)")
    p.add_argument("--rices_vision_encoder_pretrained", default="openai",
                   help="weights for the retrieval encoder: a local "
                        ".pt/HF-dir path (no network here)")
    p.add_argument("--cached_demonstration_features", default=None)
    p.add_argument("--no_caching_for_classification", action="store_true",
                   help="skip K/V caching for classification evals "
                        "(evaluate.py:79)")
    p.add_argument("--classification_prompt_ensembling", action="store_true",
                   help="average log-likelihoods over permutations of "
                        "in-context examples (evaluate.py:84)")
    # model loading
    p.add_argument("--vision_encoder_path", default="ViT-L-14")
    p.add_argument("--lm_path", default="mosaicml/mpt-1b-redpajama-200b")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--cross_attn_every_n_layers", type=int, default=1)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--int8_decode", action="store_true",
                   help="int8 weight-streaming decode (quantize.py): "
                        "halves the per-token weight DMA; prefill and "
                        "scoring stay full precision")
    p.add_argument("--int8_prefill", action="store_true",
                   help="W8A8 int8 prefill + vision forward (ops/w8a8.py):"
                        " dynamic per-token activation quant on the int8 "
                        "MXU path; implies --int8_decode")
    p.add_argument("--int4_decode", action="store_true",
                   help="int4 weight-streaming decode (quantize.py "
                        "bits=4): quarters the per-token weight DMA "
                        "(vocab head/embeddings stay int8). Composes "
                        "with --int8_prefill (W8A8 over the int4-grid "
                        "values); rank-classification scoring forwards "
                        "stay bf16 unless --int8_prefill. Coarser than "
                        "int8 — validate task quality before "
                        "production use")
    p.add_argument("--int8_kv", action="store_true",
                   help="int8 KV + media caches with per-token scales: "
                        "halves the per-step cache DMA (scan-engine "
                        "decode only; silently bf16 elsewhere)")
    p.add_argument("--int8_resident", action="store_true",
                   help="int8-only weight residency (implies "
                        "--int8_prefill): bf16 copies of quantized "
                        "kernels are dropped after quantization — "
                        "OF-9B fits a single 16GB chip")
    p.add_argument("--speculative_draft", choices=["int4", "int8"],
                   default=None,
                   help="same-weights speculative decoding for greedy "
                        "generate (num_beams=1): an int4/int8-grid "
                        "side-car of the SAME model drafts "
                        "--speculative_tokens tokens per target verify "
                        "forward (speculative.py). EXPERIMENTAL: "
                        "measured SLOWER than plain decode with same-"
                        "size drafts (BASELINE.md round 4) — it needs "
                        "a genuinely smaller trained draft to pay; "
                        "beam search paths ignore it")
    p.add_argument("--speculative_tokens", type=int, default=4,
                   help="draft window D for --speculative_draft")
    p.add_argument("--cache_demo_latents", action="store_true",
                   help="content-keyed LRU cache of per-image perceiver "
                        "latents: k-shot demos drawn from the fixed query "
                        "pool hit the ViT once instead of once per sample "
                        "(~(k+1)x less vision compute)")
    p.add_argument("--demo_latents_cache_size", type=int, default=4096,
                   help="max cached demo latents (each n_latents x D)")
    # benchmarks
    for name in ("coco", "flickr"):
        p.add_argument(f"--eval_{name}", action="store_true")
        p.add_argument(f"--{name}_image_dir_path", default=None)
        p.add_argument(f"--{name}_val_image_dir_path", default=None)
        p.add_argument(f"--{name}_karpathy_json_path", default=None)
        p.add_argument(f"--{name}_annotations_json_path", default=None)
    for name in ("vqav2", "ok_vqa", "vizwiz", "textvqa"):
        p.add_argument(f"--eval_{name}", action="store_true")
        p.add_argument(f"--{name}_image_dir_path", default=None)
        p.add_argument(f"--{name}_train_image_dir_path", default=None)
        p.add_argument(f"--{name}_test_image_dir_path", default=None)
        p.add_argument(f"--{name}_train_questions_json_path", default=None)
        p.add_argument(f"--{name}_train_annotations_json_path", default=None)
        p.add_argument(f"--{name}_test_questions_json_path", default=None)
        p.add_argument(f"--{name}_test_annotations_json_path", default=None)
    p.add_argument("--eval_imagenet", action="store_true")
    p.add_argument("--imagenet_root", default=None)
    p.add_argument("--eval_hateful_memes", action="store_true")
    p.add_argument("--hateful_memes_image_dir_path", default=None)
    p.add_argument("--hateful_memes_train_annotations_json_path", default=None)
    p.add_argument("--hateful_memes_test_annotations_json_path", default=None)
    return p


def main(argv=None, *, eval_model=None):
    from .eval_datasets import (
        CaptionDataset,
        HatefulMemesDataset,
        VQADataset,
    )
    from ..parallel.distributed import process_allgather

    args, leftover = build_parser().parse_known_args(argv)
    # freeform --key value leftovers become model kwargs (evaluate.py:394-399)
    model_kwargs = {
        leftover[i].lstrip("-"): leftover[i + 1]
        for i in range(0, len(leftover) - 1, 2)
        if leftover[i].startswith("--")
    }
    if eval_model is None and args.model != "open_flamingo":
        from .models import get_eval_model

        eval_model = get_eval_model(args.model, **model_kwargs)
    if eval_model is None:
        import jax.numpy as jnp

        from ..factory import create_model_and_transforms
        from .eval_model import OpenFlamingoEvalModel

        dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
        model, params, image_processor, tokenizer = create_model_and_transforms(
            args.vision_encoder_path,
            "openai",
            args.lm_path,
            args.tokenizer_path,
            cross_attn_every_n_layers=args.cross_attn_every_n_layers,
            dtype=dtype,
            init_params=True,
        )
        if args.checkpoint_path:
            import torch

            from ..convert.flamingo_ckpt import convert_flamingo_checkpoint
            from ..factory import _graft

            sd = torch.load(args.checkpoint_path, map_location="cpu",
                            weights_only=True)
            if "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            conv = convert_flamingo_checkpoint(sd)
            if model.cfg.lm.tie_word_embeddings:
                # tied models have no separate head param; wte rows cover it
                conv["lm"].pop("lm_head", None)
            params = _graft(params, ["params", "perceiver"], conv["perceiver"])
            params = _graft(
                params, ["params", "lm"], conv["lm"],
                resize_vocab=model.cfg.lm.vocab_size,
            )
        if args.int4_decode and args.int8_resident:
            raise SystemExit(
                "--int4_decode is incompatible with --int8_resident "
                "(residency keeps only the int8 side-car; the non-"
                "generate scoring paths would have no weights at all)"
            )
        if args.int4_decode and args.int8_decode:
            raise SystemExit(
                "--int4_decode and --int8_decode are mutually exclusive "
                "(one side-car bit-width per run)"
            )
        bits = 4 if args.int4_decode else 8
        if args.int8_prefill or args.int8_resident:
            from ..ops import w8a8
            from ..quantize import quantize_prefill_params

            params = quantize_prefill_params(params, bits=bits)
            w8a8.ENABLED = True
        elif args.int4_decode:
            from ..quantize import quantize_decode_params

            params = quantize_decode_params(params, bits=4)
        elif args.int8_decode:
            from ..quantize import quantize_decode_params

            params = quantize_decode_params(params)
        draft_params = None
        if args.speculative_draft:
            if args.int8_resident:
                raise SystemExit(
                    "--speculative_draft is incompatible with "
                    "--int8_resident (the multi-token verify forward "
                    "needs the bf16 kernels residency drops)"
                )
            from ..quantize import quantize_decode_params

            draft_bits = 4 if args.speculative_draft == "int4" else 8
            draft_params = quantize_decode_params(
                {"params": params["params"]}, bits=draft_bits
            )
        if args.int8_resident:
            from ..quantize import strip_resident_params

            params = strip_resident_params(params)
        eval_model = OpenFlamingoEvalModel(
            model, params, image_processor, tokenizer,
            int8_kv=args.int8_kv,
            cache_media_latents=args.cache_demo_latents,
            media_latents_cache_size=args.demo_latents_cache_size,
            speculative_draft_params=draft_params,
            speculative_tokens=args.speculative_tokens,
        )

    rices_encoder = None
    if args.rices:
        from .rices import create_retrieval_encoder

        rices_encoder = create_retrieval_encoder(
            args.rices_vision_encoder_path,
            args.rices_vision_encoder_pretrained,
        )

    def make_rices(train_dataset, name):
        """RICES retriever over the demo pool (evaluate.py:795-806);
        reuses cached features when --cached_demonstration_features points
        at the scripts/cache_rices_features.py output dir."""
        if not args.rices:
            return None
        import os

        import numpy as np

        from .rices import RICES

        cached = None
        if args.cached_demonstration_features:
            path = os.path.join(
                args.cached_demonstration_features, f"{name}.npy"
            )
            if os.path.exists(path):
                cached = np.load(path)
        return RICES(
            train_dataset,
            rices_encoder,
            batch_size=args.batch_size,
            cached_features=cached,
        )

    results = defaultdict(list)
    for shot in args.shots:
        for seed in args.trial_seeds[: args.num_trials]:
            common = dict(
                seed=seed, num_shots=shot, batch_size=args.batch_size,
                num_samples=args.num_samples, query_set_size=args.query_set_size,
                gather=process_allgather,
            )
            if args.eval_coco:
                train = CaptionDataset(
                    args.coco_image_dir_path, args.coco_karpathy_json_path,
                    True, "coco", args.coco_val_image_dir_path,
                )
                test = CaptionDataset(
                    args.coco_image_dir_path, args.coco_karpathy_json_path,
                    False, "coco", args.coco_val_image_dir_path,
                )
                score = evaluate_captioning(
                    eval_model, train, test, dataset_name="coco",
                    rices=make_rices(train, "coco"), **common
                )
                results["coco"].append({"shots": shot, "seed": seed, "cider": score})
            if args.eval_flickr:
                train = CaptionDataset(
                    args.flickr_image_dir_path, args.flickr_karpathy_json_path,
                    True, "flickr",
                )
                test = CaptionDataset(
                    args.flickr_image_dir_path, args.flickr_karpathy_json_path,
                    False, "flickr",
                )
                score = evaluate_captioning(
                    eval_model, train, test, dataset_name="flickr",
                    rices=make_rices(train, "flickr"), **common
                )
                results["flickr"].append(
                    {"shots": shot, "seed": seed, "cider": score}
                )
            for vqa_name in ("vqav2", "ok_vqa", "vizwiz", "textvqa"):
                if not getattr(args, f"eval_{vqa_name}"):
                    continue
                g = lambda f: getattr(args, f"{vqa_name}_{f}")
                train = VQADataset(
                    g("train_image_dir_path") or g("image_dir_path"),
                    g("train_questions_json_path"),
                    g("train_annotations_json_path"), True, vqa_name,
                )
                test = VQADataset(
                    g("test_image_dir_path") or g("image_dir_path"),
                    g("test_questions_json_path"),
                    g("test_annotations_json_path"), False, vqa_name,
                )
                score = evaluate_vqa(
                    eval_model, train, test, dataset_name=vqa_name,
                    rices=make_rices(train, vqa_name),
                    max_generation_length=10 if vqa_name == "textvqa" else 5,
                    results_path=(
                        f"{vqa_name}results_{uuid.uuid4()}.json"
                        if g("test_annotations_json_path") is None
                        else None
                    ),
                    **common,
                )
                results[vqa_name].append(
                    {"shots": shot, "seed": seed, "acc": score}
                )
            if args.eval_imagenet:
                import os

                from .classification_utils import (
                    IMAGENET_1K_CLASS_ID_TO_LABEL,
                    IMAGENET_CLASSNAMES,
                )
                from .eval_datasets import ImageNetDataset

                train = ImageNetDataset(
                    os.path.join(args.imagenet_root, "train"),
                    IMAGENET_1K_CLASS_ID_TO_LABEL,
                )
                test = ImageNetDataset(
                    os.path.join(args.imagenet_root, "val"),
                    IMAGENET_1K_CLASS_ID_TO_LABEL,
                )
                score = evaluate_classification(
                    eval_model, train, test,
                    rices=make_rices(train, "imagenet"),
                    all_class_names=IMAGENET_CLASSNAMES,
                    class_id_to_name=IMAGENET_1K_CLASS_ID_TO_LABEL,
                    prompt_fn=lambda item, label: eval_model.get_imagenet_prompt(
                        label
                    ),
                    use_prompt_ensembling=args.classification_prompt_ensembling,
                    use_cache=not args.no_caching_for_classification,
                    metric="accuracy",
                    **common,
                )
                results["imagenet"].append(
                    {"shots": shot, "seed": seed, "acc": score}
                )
            if args.eval_hateful_memes:
                from .classification_utils import (
                    HM_CLASS_ID_TO_LABEL,
                    HM_CLASSNAMES,
                )

                train = HatefulMemesDataset(
                    args.hateful_memes_image_dir_path,
                    args.hateful_memes_train_annotations_json_path,
                )
                test = HatefulMemesDataset(
                    args.hateful_memes_image_dir_path,
                    args.hateful_memes_test_annotations_json_path,
                )
                score = evaluate_classification(
                    eval_model, train, test,
                    rices=make_rices(train, "hateful_memes"),
                    all_class_names=HM_CLASSNAMES,
                    class_id_to_name=HM_CLASS_ID_TO_LABEL,
                    prompt_fn=lambda item, label: eval_model.get_hateful_memes_prompt(
                        item["ocr"], label
                    ),
                    use_cache=not args.no_caching_for_classification,
                    metric="roc_auc",
                    **common,
                )
                results["hateful_memes"].append(
                    {"shots": shot, "seed": seed, "roc_auc": score}
                )

    # aggregate mean/stddev across trials per shot count (evaluate.py:
    # 414-725 aggregation semantics)
    aggregated = {}
    for bench_name, rows in results.items():
        by_shot = defaultdict(list)
        metric_key = next(
            k for k in rows[0] if k not in ("shots", "seed")
        )
        for r in rows:
            if r[metric_key] is not None:
                by_shot[r["shots"]].append(r[metric_key])
        aggregated[bench_name] = {
            "trials": rows,
            "mean": {s: float(np.mean(v)) for s, v in by_shot.items()},
            "stddev": {s: float(np.std(v)) for s, v in by_shot.items()},
        }

    if args.results_file:
        with open(args.results_file, "w") as f:
            json.dump(aggregated, f, indent=2)
    return aggregated


if __name__ == "__main__":
    main()
