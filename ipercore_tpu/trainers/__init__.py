"""Trainers: the Liquid-Warping-GAN training/personalization step functions.

Registry parity with `iPERCore/tools/trainers/__init__.py:4-30`.
"""

from ipercore_tpu.trainers.lwg_trainer import (
    LWGTrainState,
    TrainConfig,
    create_train_state,
    train_step,
    make_sharded_train_step,
)

TRAINER_REGISTRY = {
    "LWGTrainer": dict(aug_bg=False, default_gen="AttLWB-SPADE"),
    "LWGAugBGTrainer": dict(aug_bg=True, default_gen="AttLWB-SPADE"),
    "LWGFrontTrainer": dict(aug_bg=False, default_gen="AttLWB-Front"),
    "BaselineTrainer": dict(aug_bg=False, default_gen="InputConcat"),
}


def resolve_trainer(name: str) -> dict:
    """Map `opt.train_name` to its trainer spec (aug-bg branch on/off + the
    generator family the reference trainer class hardwires) — the dispatch
    role of `ModelsFactory.get_model_by_name` (`models/__init__.py:4-25`)."""
    if name not in TRAINER_REGISTRY:
        raise KeyError(f"unknown trainer {name!r}; have {sorted(TRAINER_REGISTRY)}")
    return dict(TRAINER_REGISTRY[name])
