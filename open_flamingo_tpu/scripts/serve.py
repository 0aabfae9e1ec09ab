"""Minimal user-facing serving entry over the continuous-batching
ServingEngine (serving.py): jsonl requests in, jsonl tokens/text out.

Each input line (file via --requests, or stdin):
    {"prompt": "<image>An image of", "images": ["/path.jpg"],
     "max_new_tokens": 32}
Each output line (stdout, in submission order):
    {"id": 0, "text": "...", "token_ids": [...]}

Prompts use the reference's <image>/<|endofchunk|> conventions; rows
keep decoding while finished rows are re-filled from the queue
(iteration-level scheduling — emitted tokens are exactly
flamingo_generate's greedy output per request, tests/test_serving.py).

Replaced torch path: none — the reference generates static batches only
(open_flamingo/src/flamingo.py:124-175); this is the beyond-parity
serving layer. --synthetic N serves N zero-image dummy requests for
smoke-testing without data files.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--requests", default=None,
                   help="jsonl file of requests; default: stdin")
    p.add_argument("--vision_encoder_path", default="ViT-L-14")
    p.add_argument("--lm_path", default="mosaicml/mpt-1b-redpajama-200b")
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--cross_attn_every_n_layers", type=int, default=1)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--int8_decode", action="store_true")
    p.add_argument("--int4_decode", action="store_true")
    p.add_argument("--int8_kv", action="store_true")
    p.add_argument("--batch_rows", type=int, default=8,
                   help="concurrent cache rows (tenants)")
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--max_prompt_len", type=int, default=64)
    p.add_argument("--chunk_tokens", type=int, default=8)
    p.add_argument("--pipeline_depth", type=int, default=4,
                   help="decoded chunks kept in flight before harvesting "
                        "tokens (overlaps the host round-trip with later "
                        "chunks; 0 = fully serial). With round-5 horizon "
                        "re-tenancy depth 4 wins BOTH throughput (915.6 "
                        "vs 506.3 useful tok/s serial, beating static "
                        "batching's 775) and tail latency (e2e p99 1.98s "
                        "vs 2.28 at depth 1) — BASELINE.md round-5 churn")
    p.add_argument("--t_img", type=int, default=1,
                   help="media slots per request (fixed per engine)")
    p.add_argument("--absorb_vision", action="store_true",
                   help="pre-encode queued requests' images as absorbed "
                        "side tiles riding the decode chunks "
                        "(models/absorb_vit.py); admissions then skip "
                        "the vision encode — tokens unchanged")
    p.add_argument("--absorb_batch", type=int, default=None,
                   help="images per pre-encode cycle (default: "
                        "batch_rows; larger amortizes the side weight "
                        "streams better)")
    p.add_argument("--default_max_new_tokens", type=int, default=32)
    p.add_argument("--synthetic", type=int, default=0,
                   help="serve N synthetic zero-image requests and exit "
                        "(smoke test; no files needed)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..factory import create_model_and_transforms
    from ..generation import GenerationConfig
    from ..serving import ServingEngine

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model, params, image_processor, tokenizer = create_model_and_transforms(
        args.vision_encoder_path, "openai", args.lm_path,
        args.tokenizer_path,
        cross_attn_every_n_layers=args.cross_attn_every_n_layers,
        dtype=dtype, init_params=True, scan_layers=True,
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
            conv["lm"].pop("lm_head", None)
        params = _graft(params, ["params", "perceiver"], conv["perceiver"])
        params = _graft(params, ["params", "lm"], conv["lm"],
                        resize_vocab=model.cfg.lm.vocab_size)
    if args.int4_decode:
        from ..quantize import quantize_decode_params

        params = quantize_decode_params(params, bits=4)
    elif args.int8_decode:
        from ..quantize import quantize_decode_params

        params = quantize_decode_params(params)

    eng = ServingEngine(
        model, params,
        batch_size=args.batch_rows,
        max_seq_len=args.max_seq_len,
        max_prompt_len=args.max_prompt_len,
        t_img=args.t_img,
        chunk_tokens=args.chunk_tokens,
        pipeline_depth=args.pipeline_depth,
        absorb_vision=args.absorb_vision,
        absorb_batch=args.absorb_batch,
        gen=GenerationConfig(
            max_new_tokens=0, pad_token_id=tokenizer.pad_token_id or 0,
            eos_token_id=model.cfg.eoc_token_id, int8_kv=args.int8_kv,
        ),
    )

    h = w = model.cfg.vision.image_size

    def load_images(paths):
        """(t_img, 1, H, W, C) pixels; missing slots are zero images
        (the reference pads the same way, eval/models/open_flamingo.py)."""
        out = np.zeros((args.t_img, 1, h, w, 3), np.float32)
        for j, path in enumerate(paths[: args.t_img]):
            from PIL import Image

            out[j, 0] = np.asarray(
                image_processor(Image.open(path).convert("RGB")), np.float32
            )
        return out

    if args.synthetic:
        reqs = [
            {"prompt": "<image>An image of", "images": [],
             "max_new_tokens": args.default_max_new_tokens}
            for _ in range(args.synthetic)
        ]
    else:
        src = open(args.requests) if args.requests else sys.stdin
        reqs = [json.loads(line) for line in src if line.strip()]

    tokenizer.padding_side = "left"
    order = []
    for r in reqs:
        enc = tokenizer(
            [r["prompt"]], padding="longest", truncation=True,
            max_length=args.max_prompt_len, return_tensors="np",
        )
        rid = eng.submit(
            load_images(r.get("images", [])),
            enc["input_ids"][0].astype(np.int32),
            attention_mask=enc["attention_mask"][0].astype(np.int32),
            max_new_tokens=int(
                r.get("max_new_tokens", args.default_max_new_tokens)
            ),
        )
        order.append(rid)
    results = eng.run()
    for rid in order:
        ids = results[rid]
        print(json.dumps({
            "id": int(rid),
            "token_ids": [int(t) for t in ids],
            "text": tokenizer.decode(ids, skip_special_tokens=True),
        }), flush=True)
    # latency distribution (stderr: stdout is the jsonl result stream)
    print(json.dumps({"latency": eng.latency_stats()}), file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
