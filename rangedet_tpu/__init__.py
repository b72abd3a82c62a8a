"""rangedet_tpu — a TPU-native (JAX / Flax / Pallas / pjit) range-image 3D detector
framework with the capabilities of tusen-ai/RangeDet (ICCV 2021).

Layers (bottom-up):
  ops/       pure-jnp / Pallas geometry + detection ops (decode, rotated IoU,
             weighted NMS, box assignment, target generation)
  models/    Flax modules: DLA backbone, Meta-Kernel, FPN head, losses
  data/      range-image input pipeline (Waymo npz/roidb, KITTI, synthetic)
  parallel/  device mesh + sharding helpers (pjit / shard_map data parallel)
  train/     TrainState, optimizer, LR schedules, checkpointing, fit loop
  configs/   python recipe configs (get_config(is_train) interface, mirroring
             the reference config/rangedet/*.py recipes)
  eval/      prediction-pickle and Waymo metrics_pb2 .bin export
"""

__version__ = "0.1.0"
