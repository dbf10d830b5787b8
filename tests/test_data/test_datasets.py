import os

import numpy as np
import pytest

from ipercore_tpu.data import build_dataset, ProcessedVideoDataset, BackgroundDataset
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid

S = 32


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    for name, n in [("vid_a", 6), ("vid_b", 8)]:
        proc = root / "primitives" / name / "processed"
        imgd = proc / "images"
        imgd.mkdir(parents=True)
        info = ProcessInfo(str(proc), name=name)
        names = []
        for i in range(n):
            fname = f"{i:08d}.png"
            vid.save_image(str(imgd / fname), rng.uniform(-1, 1, (S, S, 3)).astype(np.float32))
            names.append(fname)
        info.meta["valid_img_names"] = names
        smpls = np.zeros((n, 85), np.float32)
        smpls[:, 0] = 1.0
        info.set_array("smpls", smpls)
        info.set_array("masks", np.ones((n, S, S, 1), np.float32))
        info.set_array("ft_ids", np.asarray([0, 1]))
        info.set_array("bk_ids", np.asarray([n - 1, n - 2]))
        for st in ("detector", "cropper", "pose3d", "parser", "find_front", "inpaintor"):
            info.mark_run(st)
        info.serialize()
    (root / "train.txt").write_text("vid_a\nvid_b\n")
    # background folder
    bgd = root / "bgs"
    bgd.mkdir()
    vid.save_image(str(bgd / "bg0.png"), np.zeros((48, 64, 3), np.float32))
    return str(root)


def test_processed_video_dataset_sampling(dataset_root):
    ds = ProcessedVideoDataset([dataset_root], image_size=S, num_source=2, time_step=2)
    assert len(ds) == 2
    s = ds.sample(np.random.RandomState(0))
    assert s["images"].shape == (4, S, S, 3)
    assert s["smpls"].shape == (4, 85)
    assert s["masks"].shape == (4, S, S, 1)
    assert s["bg"].shape == (S, S, 3)


def test_iterate_batches(dataset_root):
    ds = ProcessedVideoDataset([dataset_root], image_size=S, num_source=2, time_step=1)
    it = ds.iterate(batch_size=2, seed=1)
    b = next(it)
    assert b["images"].shape == (2, 3, S, S, 3)
    assert b["smpls"].shape == (2, 3, 85)


def test_background_dataset_crop(dataset_root):
    bg = BackgroundDataset(os.path.join(dataset_root, "bgs"), image_size=S)
    img = bg.sample(np.random.RandomState(0))
    assert img.shape == (S, S, 3)
    empty = BackgroundDataset("/nonexistent", image_size=S)
    assert empty.sample(np.random.RandomState(0)).shape == (S, S, 3)


def test_factory_concat(dataset_root):
    ds = build_dataset("ProcessedVideo+Place2", dataset_dirs=[dataset_root],
                       background_dir=os.path.join(dataset_root, "bgs"),
                       image_size=S, num_source=2, time_step=1)
    b = next(ds.iterate(batch_size=1))
    assert "aug_bg" in b and b["aug_bg"].shape == (1, S, S, 3)


def test_factory_personalized(dataset_root):
    proc = os.path.join(dataset_root, "primitives", "vid_a", "processed")
    ds = build_dataset("Personalized", processed_dir=proc, image_size=S,
                       num_source=2, time_step=1)
    s = ds.sample(np.random.RandomState(0))
    assert s["images"].shape == (3, S, S, 3)
