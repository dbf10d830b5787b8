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
    "LWGTrainer": dict(aug_bg=False, use_bg_net=True),
    "LWGAugBGTrainer": dict(aug_bg=True, use_bg_net=True),
    "LWGFrontTrainer": dict(aug_bg=False, use_bg_net=False),
    "BaselineTrainer": dict(aug_bg=False, use_bg_net=True, baseline=True),
}
