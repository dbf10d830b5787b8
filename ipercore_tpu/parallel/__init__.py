"""Multi-chip parallelism: device meshes, sharded frame synthesis, DP training.

The reference scales with one process per GPU + NCCL DDP
(`iPERCore/services/train.py:44-51`) and serial frames at inference
(`imitator.py:341`). TPU-native replacements:

  * inference: the frame axis is embarrassingly parallel given the source
    cache — shard it over a 1-D `frames` mesh axis (`shard_frames`);
  * training: data-parallel `pjit` step with parameter replication and
    gradient psum over the `data` axis (`ipercore_tpu/parallel/training.py`);
    XLA inserts the collectives (ICI single-host, DCN multi-host).
"""

from ipercore_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ipercore_tpu.parallel.inference import sharded_synthesize
