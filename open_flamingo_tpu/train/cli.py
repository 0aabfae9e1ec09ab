"""Training CLI.

Flag-compatible (where meaningful on TPU) with open_flamingo/train/
train.py:52-219. Differences by design: NCCL/FSDP wrapping flags become
mesh shape flags (--mesh_replica/--mesh_fsdp/--mesh_model); precision is
the compute dtype (params stay fp32); webdataset URLs go through the
built-in pipeline. wandb is optional and gated.
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("open_flamingo_tpu train")
    # model (train.py:53-77)
    p.add_argument("--vision_encoder_path", default="ViT-L-14",
                   help="ViT-L-14 / ViT-B-32 / ViT-Tiny (smoke runs: "
                        "skips the ViT-L compile)")
    p.add_argument("--vision_encoder_pretrained", default="openai")
    p.add_argument("--lm_path", default="mosaicml/mpt-1b-redpajama-200b")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--cross_attn_every_n_layers", type=int, default=1)
    p.add_argument("--run_name", default="openflamingo_tpu")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--delete_previous_checkpoint", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--freeze_lm_embeddings", action="store_true")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over stacked layer groups "
                        "(compile time O(1) in depth)")
    # training (train.py:78-132)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--batch_size_mmc4", type=int, default=8)
    p.add_argument("--batch_size_laion", type=int, default=16)
    p.add_argument("--train_num_samples_mmc4", type=int, default=1000)
    p.add_argument("--train_num_samples_laion", type=int, default=2000)
    p.add_argument("--loss_multiplier_mmc4", type=float, default=1.0)
    p.add_argument("--loss_multiplier_laion", type=float, default=0.2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "linear", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--weight_decay", type=float, default=0.1)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32", "amp_bf16"])
    # data (train.py:133-170)
    p.add_argument("--laion_shards", required=False, default=None)
    p.add_argument("--mmc4_shards", required=False, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--loader_backend", default="process",
                   choices=["thread", "process"],
                   help="'process' spawns GIL-free decode workers (the "
                        "reference's DataLoader(num_workers) equivalent)")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship uint8 pixels and normalize on-device "
                        "(4x less host->device traffic)")
    p.add_argument("--dataset_resampled", action="store_true")
    p.add_argument("--mmc4_textsim_threshold", type=float, default=0.24)
    p.add_argument("--mmc4_min_num_images", type=int, default=1)
    p.add_argument("--mmc4_max_num_images", type=int, default=6)
    # mesh / distributed (replaces train.py:165-219 dist flags)
    p.add_argument("--mesh_replica", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=0,
                   help="0 = all remaining devices")
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_num_slices", type=int, default=1,
                   help="multi-slice (DCN) topologies: replica axis spans "
                        "slices (HYBRID_SHARD equivalent, train.py:329-347)")
    # logging
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--checkpoint_steps", type=int, default=0)
    p.add_argument("--report_to_wandb", action="store_true")
    p.add_argument("--save_checkpoints_to_wandb", action="store_true",
                   help="upload each checkpoint as a wandb artifact "
                        "(train_utils.py:370-371)")
    p.add_argument("--wandb_project", default="open-flamingo-tpu")
    p.add_argument("--wandb_entity", default=None,
                   help="wandb entity (open_flamingo/train/train.py "
                        "--wandb_entity)")
    p.add_argument("--offline", action="store_true",
                   help="run wandb in offline mode (train.py --offline)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of steps 2-5 here")
    return p


def main(argv: Optional[list] = None, *, model_override=None):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..factory import create_model_and_transforms
    from ..parallel import MeshConfig, make_mesh, shard_params
    from ..parallel.distributed import init_distributed_device, is_primary
    from .checkpoint import (
        checkpoint_epoch,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from .data import get_data
    from .data.laion import DataConfig
    from .optimizer import OptimizerConfig, make_optimizer, split_params
    from .train_loop import TrainLoopConfig, TrainState, make_train_step

    args = build_parser().parse_args(argv)
    if args.save_checkpoints_to_wandb and not args.report_to_wandb:
        raise ValueError("save_checkpoints_to_wandb requires report_to_wandb")
    dist = init_distributed_device()
    rank, world = dist["rank"], dist["world_size"]

    dtype = jnp.bfloat16 if args.precision in ("bf16", "amp_bf16") else jnp.float32
    if model_override is not None:
        model, params, image_processor, tokenizer = model_override
    else:
        model, params, image_processor, tokenizer = create_model_and_transforms(
            args.vision_encoder_path,
            args.vision_encoder_pretrained,
            args.lm_path,
            args.tokenizer_path,
            cross_attn_every_n_layers=args.cross_attn_every_n_layers,
            freeze_lm_embeddings=args.freeze_lm_embeddings,
            gradient_checkpointing=args.gradient_checkpointing,
            scan_layers=args.scan_layers,
            dtype=dtype,
            init_params=True,
            init_seed=args.seed,
        )
    cfg = model.cfg

    n_dev = len(jax.devices())
    fsdp = args.mesh_fsdp or n_dev // (args.mesh_replica * args.mesh_model)
    mesh = make_mesh(
        MeshConfig(replica=args.mesh_replica, fsdp=fsdp, model=args.mesh_model),
        num_slices=args.mesh_num_slices,
    )

    train, frozen = split_params(params, args.freeze_lm_embeddings)
    tx = make_optimizer(
        OptimizerConfig(
            learning_rate=args.learning_rate,
            weight_decay=args.weight_decay,
            warmup_steps=args.warmup_steps,
            schedule=args.lr_scheduler,
        ),
        media_token_id=cfg.media_token_id,
        eoc_token_id=cfg.eoc_token_id,
        mask_embedding_rows=not args.freeze_lm_embeddings,
    )
    if args.gradient_accumulation_steps > 1:
        import optax

        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)

    train = shard_params(train, mesh)
    frozen = shard_params(frozen, mesh)
    state = TrainState.create(train, tx)

    start_epoch = 0
    resume = args.resume_from_checkpoint
    if resume == "auto" or resume is None:
        resume = latest_checkpoint(args.run_name)
    if resume:
        state = load_checkpoint(resume, state)
        start_epoch = checkpoint_epoch(resume) + 1
        if is_primary():
            print(f"resumed from {resume} (epoch {start_epoch})")

    loop_cfg = TrainLoopConfig(
        loss_multiplier_laion=args.loss_multiplier_laion,
        loss_multiplier_mmc4=args.loss_multiplier_mmc4,
        pad_token_id=getattr(tokenizer, "pad_token_id", 0) or 0,
    )
    step_fn = jax.jit(make_train_step(model, tx, loop_cfg))
    data_sharding = NamedSharding(mesh, P(("replica", "fsdp")))

    def put(batch):
        return {
            k: jax.device_put(
                v,
                NamedSharding(
                    mesh, P(("replica", "fsdp"), *([None] * (v.ndim - 1)))
                ),
            )
            for k, v in batch.items()
        }

    def data_cfg(shards, bs, n):
        return DataConfig(
            shards=shards, batch_size=bs, train_num_samples=n,
            seed=args.seed, workers=args.workers, host_id=rank,
            num_hosts=world, dataset_resampled=args.dataset_resampled,
            loader_backend=args.loader_backend,
            device_preprocess=args.device_preprocess,
            mmc4_textsim_threshold=args.mmc4_textsim_threshold,
            mmc4_min_num_images=args.mmc4_min_num_images,
            mmc4_max_num_images=args.mmc4_max_num_images,
        )

    wandb = None
    if args.report_to_wandb and is_primary():
        try:
            import wandb as _wandb

            wandb = _wandb
            wandb.init(
                project=args.wandb_project,
                entity=args.wandb_entity,
                name=args.run_name,
                mode="offline" if args.offline else "online",
            )
        except ImportError:
            print("wandb not installed; skipping wandb logging")

    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, args.num_epochs):
            laion = get_data(
                data_cfg(args.laion_shards, args.batch_size_laion,
                         args.train_num_samples_laion),
                image_processor, tokenizer, "image_text", epoch,
            )
            mmc4 = get_data(
                data_cfg(args.mmc4_shards, args.batch_size_mmc4,
                         args.train_num_samples_mmc4),
                image_processor, tokenizer, "mmc4", epoch,
            )
            n_batches = min(len(laion.dataloader), len(mmc4.dataloader))
            if args.steps_per_epoch:
                n_batches = min(n_batches, args.steps_per_epoch)

            t_end = time.time()
            for i, (bl, bm) in enumerate(zip(laion.dataloader, mmc4.dataloader)):
                if i >= n_batches:
                    break
                if args.profile_dir and i == 2 and epoch == start_epoch:
                    jax.profiler.start_trace(args.profile_dir)
                data_time = time.time() - t_end
                state, metrics = step_fn(state, frozen, put(bl), put(bm))
                if args.profile_dir and i == 5 and epoch == start_epoch:
                    jax.tree.map(
                        lambda x: x.block_until_ready()
                        if hasattr(x, "block_until_ready") else x,
                        metrics,
                    )
                    jax.profiler.stop_trace()
                if (i % args.logging_steps == 0) or i == n_batches - 1:
                    metrics = jax.tree.map(float, jax.device_get(metrics))
                    step_time = time.time() - t_end
                    tokens = (
                        bl["input_ids"].size + bm["input_ids"].size
                    ) * world
                    if is_primary():
                        print(
                            f"epoch {epoch} step {i}/{n_batches} "
                            f"loss {metrics['loss']:.4f} "
                            f"(laion {metrics['loss_laion']:.4f} "
                            f"mmc4 {metrics['loss_mmc4']:.4f}) "
                            f"tokens/s {tokens / max(step_time, 1e-6):.0f} "
                            f"data_time {data_time:.3f}s",
                            flush=True,
                        )
                    if wandb:
                        wandb.log(
                            {**metrics, "epoch": epoch,
                             "tokens_per_sec": tokens / max(step_time, 1e-6)},
                            step=int(state.step),
                        )
                t_end = time.time()

            if is_primary() or jax.process_count() > 1:
                save_checkpoint(
                    args.run_name, state, epoch,
                    keep_last=1 if args.delete_previous_checkpoint else None,
                )
                if wandb and args.save_checkpoints_to_wandb:
                    # Orbax checkpoints are directories; upload as an
                    # artifact (reference: wandb.save of the .pt file,
                    # train_utils.py:370-371)
                    art = wandb.Artifact(
                        f"checkpoint_{epoch}", type="checkpoint"
                    )
                    art.add_dir(f"{args.run_name}/checkpoint_{epoch}")
                    wandb.log_artifact(art)
    return state


if __name__ == "__main__":
    main()
