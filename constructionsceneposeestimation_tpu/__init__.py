"""ConstructionScenePoseEstimation-TPU: a TPU-native synthetic-data + pose-estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``xander683/ConstructionScenePoseEstimation`` (a single-process Isaac Sim
datagen script, reference at ``generate_construction_data.py``): batched scene
parameter sampling, on-device analytic rendering + annotation, Gaussian
keypoint heatmaps, a heatmap-regression backbone, soft-argmax/DARK decoding,
batched PnP 6-DoF recovery, and a sharded multi-chip datagen/training pipeline.

Layers (bottom-up; see SURVEY.md section 7):
  core      pure-JAX geometry/camera math
  scene     class taxonomy, procedural CAD proxy assets, articulation
  sample    domain randomization samplers (camera ladder, placement, lighting)
  render    batched analytic ray-cast renderer + annotation derivation
  ops       Pallas TPU kernels (heatmaps, decode, preprocessing, PnP linalg)
  models    keypoint-heatmap backbones (flax)
  train     sharded train step / optimizer plumbing
  eval      PCK / ADD metrics
  io        reference-schema-exact serialization + quality logging
  parallel  mesh construction + shard_map pipeline drivers
"""

__version__ = "0.1.0"
