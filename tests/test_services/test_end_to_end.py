"""End-to-end smoke: preprocess -> personalize -> imitate on synthetic frames.

The minimum end-to-end slice of SURVEY.md §7.2 step 4 — exercises services,
manifest, preprocessing stages (fallback perception), the trainer, and the
synthesis path, hermetically on CPU at tiny sizes.
"""
import os

import numpy as np
import pytest

from ipercore_tpu.services.options import setup
from ipercore_tpu.services.meta_info import MetaProcess
from ipercore_tpu.services.process_info import ProcessInfo
from ipercore_tpu.utils import video as vid

S = 32


@pytest.fixture(scope="module")
def opt(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    cfg = setup(None, [])
    cfg.image_size = S
    cfg.num_source = 2
    cfg.time_step = 1
    cfg.output_dir = str(root)
    cfg.model_id = "e2e_model"
    cfg.out_dilate_ks = 5
    cfg.Generator = {
        "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
        "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
        "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
    }
    cfg.Discriminator = {"ndf": 8, "n_layers": 2, "max_nf_mult": 8, "use_sigmoid": False}
    cfg.Train.niters_or_epochs_no_decay = 1
    cfg.preproc_smoke = True
    cfg.smoke_model = True
    # synthetic inputs: a "video" of noise frames for src and ref
    rng = np.random.RandomState(0)
    for name, n in [("person_a", 4), ("dance_b", 5)]:
        d = root / f"raw_{name}"
        d.mkdir()
        for i in range(n):
            vid.save_image(str(d / f"{i:04d}.png"),
                           rng.uniform(-1, 1, (S, S, 3)).astype(np.float32))
    cfg.src_path = f"path?={root}/raw_person_a,name?=person_a"
    cfg.ref_path = f"path?={root}/raw_dance_b,name?=dance_b,fps?=10"
    return cfg


@pytest.fixture(scope="module")
def pipeline(opt):
    """Run preprocess + personalize once for all tests in this module."""
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.services.personalization import personalize

    preprocess(opt)
    ckpt = personalize(opt)
    return {"ckpt": ckpt}


def test_preprocess_creates_manifest(opt, pipeline):
    proc = MetaProcess("person_a", opt.output_dir).processed_dir
    info = ProcessInfo.deserialize(proc)
    assert info.check_has_been_processed()
    assert info.get_array("smpls").shape[1] == 85
    assert info.get_array("masks") is not None
    assert os.path.exists(os.path.join(proc, "background.png"))
    ref = ProcessInfo.deserialize(MetaProcess("dance_b", opt.output_dir).processed_dir)
    assert len(ref.read_ref_info()["smpls"]) == 5


def test_personalize_writes_checkpoint(opt, pipeline):
    from ipercore_tpu.services.personalization import personalize

    path = pipeline["ckpt"]
    assert os.path.exists(path)
    # second call is a no-op skip (`personalization.py:179`)
    assert personalize(opt) == path


def test_imitate_produces_frames(opt, pipeline):
    from ipercore_tpu.services.run_imitator import imitate

    outputs = imitate(opt)
    assert outputs
    out = outputs[0]
    frames = [f for f in os.listdir(out if os.path.isdir(out) else os.path.dirname(out))
              if f.startswith("pred_")]
    assert len(frames) == 5
    img = vid.load_image(os.path.join(
        out if os.path.isdir(out) else os.path.dirname(out), sorted(frames)[0]))
    assert img.shape == (S, S, 3)
    assert np.isfinite(img).all()


def test_novel_view_service(opt, pipeline):
    from ipercore_tpu.services.run_viewer import novel_view

    opt2 = opt
    opt2.view_frames = 4
    outputs = novel_view(opt2)
    assert outputs
    out = outputs[0]
    d = out if os.path.isdir(out) else os.path.dirname(out)
    assert len([f for f in os.listdir(d) if f.startswith("pred_")]) == 4


def test_evaluator_metrics(opt):
    from ipercore_tpu.services.evaluate import evaluate_frames

    rng = np.random.RandomState(1)
    a = rng.uniform(-1, 1, (3, S, S, 3)).astype(np.float32)
    noise = a + rng.randn(3, S, S, 3).astype(np.float32) * 0.05
    m = evaluate_frames(noise, a)
    m_self = evaluate_frames(a, a)
    assert m_self["ssim"] > 0.999
    assert m_self["lpips"] < 1e-5
    assert m["ssim"] < m_self["ssim"]
    assert np.isfinite(m["fid_proxy"])
