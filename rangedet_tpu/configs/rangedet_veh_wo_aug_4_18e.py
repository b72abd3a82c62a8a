"""Vehicle-only, 1/4 data, 18 epochs, no augmentation — the reference's
primary single-class recipe (config/rangedet/rangedet_veh_wo_aug_4_18e.py).
Published baseline: WOD val Veh L1 3D-AP/APH 67.2/66.6 (README.md:73).
"""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_veh_wo_aug_4_18e",
        is_train=is_train,
        layout="bhcw",  # bhcw fwd is 1.45x nhwc at eval B=4 too (BENCH.md round 2)
        # fused Meta-Kernel block for training (train-only gate inside
        # MetaBlock; eval keeps the einsum form — BENCH.md round 3)
        use_pallas_meta=True,
        batch_image=2 if is_train else 1,
        label_set=(1,),
        class_names=("veh",),
        filter_class=("TYPE_VEHICLE",),
        sampling_rate=4,
        end_epoch=18,
        lr_steps=(12, 15),
    )
