"""Flax network zoo: generators (7 variants), discriminators (4 variants), criterions.

Factory parity with the reference's `NetworksFactory`
(`iPERCore/models/networks/__init__.py:3-67`).
"""

from ipercore_tpu.models.networks.generators import build_generator, GENERATOR_REGISTRY
from ipercore_tpu.models.networks.discriminators import build_discriminator, DISCRIMINATOR_REGISTRY
