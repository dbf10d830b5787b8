"""Smoke tests for the repo-level scripts (accuracy-cost eval, dataset
inspection) — tiny configs, hermetic CPU."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_accuracy_cost_smoke(capsys):
    sys.path.insert(0, os.path.join(REPO, "scripts", "evaluate"))
    import accuracy_cost

    rc = accuracy_cost.main(["--smoke", "--frames", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bench_bf16_stride2" in out and "SSIM" in out


def test_visual_processed_data_smoke(tmp_path):
    # fabricate one processed video via the preprocess service smoke path
    from ipercore_tpu.services.options import setup
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.utils import video as vid

    S = 32
    root = str(tmp_path)
    cfg = setup(None, [])
    cfg.image_size = S
    cfg.num_source = 2
    cfg.output_dir = root
    cfg.model_id = "m"
    cfg.preproc_smoke = True
    cfg.smoke_model = True
    rng = np.random.RandomState(0)
    d = tmp_path / "raw"
    d.mkdir()
    for i in range(5):
        vid.save_image(str(d / f"{i:04d}.png"),
                       rng.uniform(-1, 1, (S, S, 3)).astype(np.float32))
    cfg.src_path = f"path?={d},name?=vidA"
    cfg.ref_path = ""
    preprocess(cfg)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import visual_processed_data

    out_dir = str(tmp_path / "inspect")
    rc = visual_processed_data.main([
        "--dataset_dir", root, "--out_dir", out_dir, "--image_size", str(S),
        "--num_batches", "1", "--time_step", "1", "--smoke_model"])
    assert rc == 0
    assert any(f.endswith(".png") for f in os.listdir(out_dir))
