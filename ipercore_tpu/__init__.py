"""ipercore_tpu: a TPU-native (JAX/XLA/Pallas) human-image-synthesis framework.

Capabilities mirror iPERDance/iPERCore (motion imitation, appearance transfer,
novel view / bullet-time synthesis) but the implementation is designed for TPU:
NHWC tensors, static shapes, jit-compiled frame-batched synthesis, Pallas kernels
for the SMPL rasterizer, and jax.sharding meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"
