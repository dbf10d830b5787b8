"""AugBG trainer branch (LWGAugBGTrainer parity) — extra bg supervision."""
import numpy as np
import jax
import jax.numpy as jnp

from ipercore_tpu.models import smpl as smpl_mod
from ipercore_tpu.models import flow_composition as fc
from ipercore_tpu.models.mesh import load_assets
from ipercore_tpu.models.networks import build_generator, build_discriminator
from ipercore_tpu.models.networks import criterions as C
from ipercore_tpu.trainers import lwg_trainer as T

S, NS, NT = 64, 2, 1

CFG = {
    "BGNet": {"num_filters": [8, 16, 16, 32], "n_res_block": 1},
    "SIDNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
    "TSFNet": {"num_filters": [8, 16, 32], "n_res_block": 1},
}


def test_aug_bg_train_step_runs_and_supervises():
    model = smpl_mod.synthetic_model(nu=20, nv=18)
    assets = load_assets(model, uv_map_path="/nonexistent", part_path="/nonexistent")
    comp = fc.make_composer(model, assets, image_size=S, out_dilate_ks=5)
    gen = build_generator("AttLWB-SPADE", CFG)
    dis = build_discriminator("patch_global", {"ndf": 8, "n_layers": 2, "max_nf_mult": 8})
    vgg = C.VGGFeatures(slices=((4,), (8,), (8,), (8,), (8,)))
    vgg_params = jax.jit(vgg.init)(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))
    face = C.SphereFaceFeatures()
    face_params = jax.jit(face.init)(jax.random.PRNGKey(2), jnp.zeros((1, 112, 96, 3)))
    cfg = T.TrainConfig(aug_bg=True, use_face=False)
    state = T.create_train_state(jax.random.PRNGKey(0), gen, dis, comp, cfg, ns=NS, nt=NT)

    rng = np.random.RandomState(0)
    smpls = np.zeros((1, NS + NT, 85), np.float32)
    smpls[:, :, 0] = 1.2
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (1, NS + NT, S, S, 3)), jnp.float32),
        "smpls": jnp.asarray(smpls),
        "masks": jnp.ones((1, NS + NT, S, S, 1), jnp.float32),
        "bg": jnp.zeros((1, S, S, 3), jnp.float32),
        "aug_bg": jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32),
    }
    import functools

    step = jax.jit(functools.partial(
        T.train_step, comp=comp, generator=gen, discriminator=dis, vgg=vgg,
        vgg_params=vgg_params, face=face, face_params=face_params, cfg=cfg, ns=NS))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_total"]))
    assert int(new_state.step) == 1
