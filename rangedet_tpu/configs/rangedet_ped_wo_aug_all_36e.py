"""Pedestrian-only, full data, 36 epochs (reference:
config/rangedet/rangedet_ped_wo_aug_all_36e.py). Published baseline: WOD val
Ped L1 3D-AP/APH 70.9/66.4 (README.md:76)."""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_ped_wo_aug_all_36e",
        is_train=is_train,
        layout="bhcw",  # bhcw fwd is 1.45x nhwc at eval B=4 too (BENCH.md round 2)
        # fused Meta-Kernel block for training (train-only gate inside
        # MetaBlock; eval keeps the einsum form — BENCH.md round 3)
        use_pallas_meta=True,
        batch_image=2 if is_train else 1,
        label_set=(2,),
        class_names=("ped",),
        filter_class=("TYPE_PEDESTRIAN",),
        sampling_rate=1,
        end_epoch=36,
        lr_steps=(24, 30),
    )
