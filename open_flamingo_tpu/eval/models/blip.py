"""BLIP-2 baseline adapter (parity with open_flamingo/eval/models/blip.py):
0-shot only, single image per prompt, runs the HF torch model on CPU from
a local checkpoint directory. Used to reproduce the paper's BLIP-2
baseline rows; not a TPU path.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..eval_model import BaseEvalModel


class BLIPEvalModel(BaseEvalModel):
    def __init__(self, lm_path: str, processor_path: str = None, **_):
        import torch
        from transformers import AutoProcessor, Blip2ForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(
            processor_path or lm_path, local_files_only=True
        )
        self.model = Blip2ForConditionalGeneration.from_pretrained(
            lm_path, local_files_only=True
        ).eval()
        self.torch = torch

    # BLIP prompts have no <image>/<|endofchunk|> markup (blip.py)
    def get_caption_prompt(self, caption=None) -> str:
        return f"A photo of {caption if caption is not None else ''}"

    def get_vqa_prompt(self, question, answer=None) -> str:
        return (
            f"Question:{question} Answer:{answer if answer is not None else ''}"
        )

    def _last_image(self, row):
        return row[-1]

    def get_outputs(
        self,
        batch_text: List[str],
        batch_images,
        min_generation_length: int = 0,
        max_generation_length: int = 20,
        num_beams: int = 3,
        length_penalty: float = 0.0,
    ) -> List[str]:
        imgs = [self._last_image(r) for r in batch_images]
        inputs = self.processor(
            images=imgs, text=batch_text, padding=True, return_tensors="pt"
        )
        with self.torch.no_grad():
            out = self.model.generate(
                **inputs,
                max_new_tokens=max_generation_length,
                min_new_tokens=min_generation_length,
                num_beams=num_beams,
                length_penalty=length_penalty,
            )
        return self.processor.batch_decode(out, skip_special_tokens=True)

    def get_rank_classifications(
        self,
        batch_text: List[str],
        batch_images,
        all_class_names: List[str],
        use_cache: bool = False,
        normalize_length: bool = True,
    ) -> np.ndarray:
        imgs = [self._last_image(r) for r in batch_images]
        scores = np.zeros((len(batch_text), len(all_class_names)), np.float32)
        with self.torch.no_grad():
            for ci, cname in enumerate(all_class_names):
                texts = [t + cname for t in batch_text]
                inputs = self.processor(
                    images=imgs, text=texts, padding=True, return_tensors="pt"
                )
                labels = inputs["input_ids"].clone()
                out = self.model(**inputs, labels=labels)
                # per-sample mean logprob over the class tokens
                logits = out.logits[:, :-1]
                tgt = labels[:, 1:]
                logp = self.torch.log_softmax(logits.float(), -1)
                tok_lp = logp.gather(-1, tgt[..., None].clamp(min=0))[..., 0]
                n_class_tokens = len(
                    self.processor.tokenizer(cname)["input_ids"]
                )
                sel = tok_lp[:, -n_class_tokens:]
                val = sel.mean(-1) if normalize_length else sel.sum(-1)
                scores[:, ci] = val.numpy()
        return scores
