"""Eval datasets — same on-disk formats as the reference
(open_flamingo/eval/eval_datasets.py:11-157): COCO/Flickr karpathy-split
json, VQA-format question+annotation jsons, ImageNet folder layout,
HatefulMemes jsonl with OCR text. Plain-python datasets (no torch)."""

from __future__ import annotations

import json
import os
from typing import Optional


class CaptionDataset:
    """Karpathy-split captioning dataset (eval_datasets.py:11-64)."""

    def __init__(
        self,
        image_train_dir_path: str,
        annotations_path: str,
        is_train: bool,
        dataset_name: str,
        image_val_dir_path: Optional[str] = None,
    ):
        self.image_train_dir_path = image_train_dir_path
        self.image_val_dir_path = image_val_dir_path
        self.is_train = is_train
        self.dataset_name = dataset_name
        full = json.load(open(annotations_path))["images"]
        split = "train" if is_train else "test"
        if dataset_name == "coco":
            want = {"train": ("train", "restval"), "test": ("val",)}[split]
        else:  # flickr30k: karpathy test field
            want = {"train": ("train",), "test": ("test",)}[split]
        self.annotations = [x for x in full if x["split"] in want]

    def __len__(self):
        return len(self.annotations)

    def _image_path(self, ann):
        if self.dataset_name == "coco":
            base = (
                self.image_train_dir_path
                if ann["filepath"] == "train2014"
                else (self.image_val_dir_path or self.image_train_dir_path)
            )
            return os.path.join(base, ann["filename"])
        return os.path.join(self.image_train_dir_path, ann["filename"])

    def __getitem__(self, idx):
        from PIL import Image

        ann = self.annotations[idx]
        image = Image.open(self._image_path(ann)).convert("RGB")
        return {
            "image": image,
            "caption": ann["sentences"][0]["raw"],
            "image_id": ann["cocoid"] if self.dataset_name == "coco" else ann["imgid"],
        }


class VQADataset:
    """VQA-format questions+annotations (eval_datasets.py:67-114)."""

    def __init__(
        self,
        image_dir_path: str,
        question_path: str,
        annotations_path: Optional[str],
        is_train: bool,
        dataset_name: str,
    ):
        self.questions = json.load(open(question_path))["questions"]
        self.answers = (
            json.load(open(annotations_path))["annotations"]
            if annotations_path
            else None
        )
        if self.answers is not None:
            by_qid = {a["question_id"]: a for a in self.answers}
            self.answers = [by_qid[q["question_id"]] for q in self.questions]
        self.image_dir_path = image_dir_path
        self.is_train = is_train
        self.dataset_name = dataset_name

    def __len__(self):
        return len(self.questions)

    def get_img_path(self, question):
        if self.dataset_name in ("vqav2", "ok_vqa"):
            split = "train2014" if self.is_train else "val2014"
            return os.path.join(
                self.image_dir_path,
                f"COCO_{split}_{question['image_id']:012d}.jpg",
            )
        if self.dataset_name in ("vizwiz", "textvqa"):
            name = question["image_id"]
            if self.dataset_name == "textvqa":
                name = f"{name}.jpg"
            return os.path.join(self.image_dir_path, str(name))
        raise ValueError(self.dataset_name)

    def __getitem__(self, idx):
        from PIL import Image

        q = self.questions[idx]
        image = Image.open(self.get_img_path(q)).convert("RGB")
        out = {
            "image": image,
            "question": q["question"],
            "question_id": q["question_id"],
        }
        if self.answers is not None:
            out["answers"] = [a["answer"] for a in self.answers[idx]["answers"]]
        return out


class ImageNetDataset:
    """ImageFolder layout: root/<class_dir>/xxx.jpg with a classname map
    (eval_datasets.py:117-134)."""

    def __init__(self, root: str, class_id_to_name=None):
        self.samples = []
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        for ci, cls in enumerate(classes):
            cdir = os.path.join(root, cls)
            for fname in sorted(os.listdir(cdir)):
                self.samples.append((os.path.join(cdir, fname), ci))
        self.classes = classes
        self.class_id_to_name = class_id_to_name or {
            i: c for i, c in enumerate(classes)
        }

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        from PIL import Image

        path, ci = self.samples[idx]
        return {
            "id": idx,
            "image": Image.open(path).convert("RGB"),
            "class_id": ci,
            "class_name": self.class_id_to_name[ci],
        }


class HatefulMemesDataset:
    """jsonl with img/text/label fields (eval_datasets.py:137-157)."""

    def __init__(self, image_dir_path: str, annotations_path: str):
        self.image_dir_path = image_dir_path
        with open(annotations_path) as f:
            self.annotations = [json.loads(line) for line in f if line.strip()]

    def __len__(self):
        return len(self.annotations)

    def __getitem__(self, idx):
        from PIL import Image

        ann = self.annotations[idx]
        image = Image.open(
            os.path.join(self.image_dir_path, os.path.basename(ann["img"]))
        ).convert("RGB")
        return {
            "id": ann["id"],
            "image": image,
            "ocr": ann["text"],
            "class_name": "yes" if ann["label"] == 1 else "no",
            "class_id": ann["label"],
        }
