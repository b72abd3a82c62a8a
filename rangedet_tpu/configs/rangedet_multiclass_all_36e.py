"""Multi-class veh+ped+cyc, full data — the driver's scale-out recipe
(BASELINE.json configs[4]); exercises the class-aware target expansion and
per-class prediction paths (num_classes=3)."""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_multiclass_all_36e",
        is_train=is_train,
        layout="bhcw",  # bhcw fwd is 1.45x nhwc at eval B=4 too (BENCH.md round 2)
        # fused Meta-Kernel block for training (train-only gate inside
        # MetaBlock; eval keeps the einsum form — BENCH.md round 3)
        use_pallas_meta=True,
        batch_image=2 if is_train else 1,
        label_set=(1, 2, 4),
        class_names=("veh", "ped", "cyc"),
        filter_class=("TYPE_VEHICLE", "TYPE_PEDESTRIAN", "TYPE_CYCLIST"),
        sampling_rate=1,
        end_epoch=36,
        lr_steps=(24, 30),
        # long-schedule full-data recipe benefits from the geometric
        # augmentations (the reference ships them defined but disabled)
        augment=("flip", "rotation"),
    )
