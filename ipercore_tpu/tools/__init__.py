"""Perception + geometry runtime: the TPU rebuild of `iPERCore/tools/`.

Builder parity with `tools/processors/preprocessors.py:9-13,83-123`:
build_tracker / build_pose2d_estimator / build_pose3d_estimator /
build_pose3d_refiner / build_mattor / build_background_inpaintors.
"""

from ipercore_tpu.tools.trackers import MaxBoxTracker, build_tracker
