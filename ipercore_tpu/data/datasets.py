"""Datasets over preprocessed `primitives/` trees.

Rebuilds `iPERCore/data/` (§2.5 of SURVEY.md):
  * `ProcessedVideoDataset` (`processed_video_dataset.py:14-113`): per video,
    sample ns source frames from the front ids + nt random target frames;
  * `PersonalizedDataset` (`personalized_dataset.py:13-191`): single subject,
    fixed front/back sources, random targets, pseudo-bg;
  * `BackgroundDataset` (`place_dataset.py` Place2Dataset): random background
    crops for aug-bg training;
  * `VideoBackgroundDataset` (`concat_dataset.py:9`): zips the two.

All return numpy batches shaped for `trainers.lwg_trainer.train_step`
(NHWC, images in [-1, 1], masks background=1). Host-side prefetch threads can
wrap `iterate()`; samples are random-access by (video, frame) for sharding.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid


def _load_frames(img_dir: str, names: list[str], size: int) -> np.ndarray:
    return np.stack([vid.load_image(os.path.join(img_dir, n), size=size) for n in names])


class ProcessedVideoDataset:
    """Multi-video training dataset — `ProcessedVideoDataset:14`.

    Args:
        dataset_dirs: roots containing `train.txt` (one video name per line)
            and `primitives/<vid>/processed/` trees.
    """

    def __init__(self, dataset_dirs: list[str], image_size: int = 512,
                 num_source: int = 2, time_step: int = 2, split: str = "train"):
        self.image_size = image_size
        self.ns = num_source
        self.nt = time_step
        self.videos: list[dict] = []
        for root in dataset_dirs:
            txt = os.path.join(root, f"{split}.txt")
            if os.path.exists(txt):
                names = [l.strip() for l in open(txt) if l.strip()]
            else:
                prim = os.path.join(root, "primitives")
                names = sorted(os.listdir(prim)) if os.path.isdir(prim) else []
            for name in names:
                proc = os.path.join(root, "primitives", name, "processed")
                info = ProcessInfo.deserialize(proc)
                smpls = info.get_array("smpls")
                if smpls is None or len(smpls) < self.ns + self.nt:
                    continue
                self.videos.append({"proc": proc, "info": info})

    def __len__(self):
        return len(self.videos)

    def sample(self, rng: np.random.RandomState, vid_idx: Optional[int] = None) -> dict:
        """One training sample — `_load_pairs:49`: ns sources from front ids +
        nt random targets."""
        v = self.videos[vid_idx if vid_idx is not None else rng.randint(len(self.videos))]
        info: ProcessInfo = v["info"]
        src = info.read_src_info(self.ns)
        smpls = info.get_array("smpls")
        n = len(smpls)
        tgt_ids = rng.randint(0, n, size=self.nt)
        ids = list(src["src_ids"]) + list(tgt_ids)

        names = [info.meta["valid_img_names"][i] for i in ids]
        img_dir = os.path.join(v["proc"], "images")
        images = _load_frames(img_dir, names, self.image_size)

        masks_arr = info.get_array("masks")
        if masks_arr is not None:
            masks = masks_arr[ids].astype(np.float32)
            if masks.ndim == 3:
                masks = masks[..., None]
            if masks.shape[1] != self.image_size:
                import jax

                masks = np.asarray(jax.image.resize(
                    masks, (len(ids), self.image_size, self.image_size, 1), "linear"))
        else:
            masks = np.ones((len(ids), self.image_size, self.image_size, 1), np.float32)

        bg_path = os.path.join(v["proc"], "background.png")
        bg = (vid.load_image(bg_path, size=self.image_size)
              if os.path.exists(bg_path)
              else np.zeros((self.image_size, self.image_size, 3), np.float32))

        return {
            "images": images.astype(np.float32),
            "smpls": smpls[ids].astype(np.float32),
            "masks": masks,
            "bg": bg,
            "offsets": src["offsets"],
        }

    def iterate(self, batch_size: int, seed: int = 0) -> Iterator[dict]:
        rng = np.random.RandomState(seed)
        while True:
            samples = [self.sample(rng) for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples])
                for k in ("images", "smpls", "masks", "bg")
            }


class PersonalizedDataset(ProcessedVideoDataset):
    """Single-subject dataset for personalization — `personalized_dataset.py:13`."""

    def __init__(self, processed_dir: str, image_size: int = 512,
                 num_source: int = 2, time_step: int = 1):
        self.image_size = image_size
        self.ns = num_source
        self.nt = time_step
        info = ProcessInfo.deserialize(processed_dir)
        self.videos = [{"proc": processed_dir, "info": info}]


class BackgroundDataset:
    """Random background image crops — role of Place2Dataset
    (`place_dataset.py:171`): any folder of images serves as aug backgrounds."""

    def __init__(self, image_dir: str, image_size: int = 512):
        self.paths = vid.list_frames(image_dir) if os.path.isdir(image_dir) else []
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def sample(self, rng: np.random.RandomState) -> np.ndarray:
        if not self.paths:
            return np.zeros((self.image_size, self.image_size, 3), np.float32)
        img = vid.load_image(self.paths[rng.randint(len(self.paths))])
        h, w = img.shape[:2]
        side = min(h, w)
        # random square crop + resize (RandomResizedCrop-lite)
        y0 = rng.randint(0, h - side + 1)
        x0 = rng.randint(0, w - side + 1)
        crop = img[y0:y0 + side, x0:x0 + side]
        if rng.rand() < 0.5:
            crop = crop[:, ::-1]
        import jax

        return np.asarray(jax.image.resize(
            crop.copy(), (self.image_size, self.image_size, 3), "linear"))


class VideoBackgroundDataset:
    """Zip a video sample with an aug background — `concat_dataset.py:9`."""

    def __init__(self, video_ds: ProcessedVideoDataset, bg_ds: BackgroundDataset):
        self.video_ds = video_ds
        self.bg_ds = bg_ds

    def __len__(self):
        return len(self.video_ds)

    def sample(self, rng: np.random.RandomState) -> dict:
        s = self.video_ds.sample(rng)
        s["aug_bg"] = self.bg_ds.sample(rng)
        return s

    def iterate(self, batch_size: int, seed: int = 0) -> Iterator[dict]:
        rng = np.random.RandomState(seed)
        while True:
            samples = [self.sample(rng) for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples])
                for k in ("images", "smpls", "masks", "bg", "aug_bg")
            }


DATASET_REGISTRY = {
    "ProcessedVideo": ProcessedVideoDataset,
    "ProcessedVideo+Place2": VideoBackgroundDataset,
    "Personalized": PersonalizedDataset,
}


def build_dataset(name: str, **kw):
    """DatasetFactory parity (`data/dataset.py:13-43`)."""
    if name == "ProcessedVideo+Place2":
        video = ProcessedVideoDataset(
            kw["dataset_dirs"], kw.get("image_size", 512),
            kw.get("num_source", 2), kw.get("time_step", 2),
            split=kw.get("split", "train"))
        bg = BackgroundDataset(kw.get("background_dir", ""), kw.get("image_size", 512))
        return VideoBackgroundDataset(video, bg)
    if name not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset {name!r}")
    cls = DATASET_REGISTRY[name]
    return cls(**kw)
