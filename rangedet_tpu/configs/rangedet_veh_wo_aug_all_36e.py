"""Vehicle-only, full data, 36 epochs — the reference's flagship recipe
(config/rangedet/rangedet_veh_wo_aug_all_36e.py pattern; the 4 shipped configs
differ only in class / sampling_rate / epochs). Published baseline: WOD val
Veh L1 3D-AP/APH 70.1/69.6 (README.md:75) — the north-star parity target.
"""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_veh_wo_aug_all_36e",
        is_train=is_train,
        layout="bhcw",  # bhcw fwd is 1.45x nhwc at eval B=4 too (BENCH.md round 2)
        # fused Meta-Kernel block for training (train-only gate inside
        # MetaBlock; eval keeps the einsum form — BENCH.md round 3)
        use_pallas_meta=True,
        batch_image=2 if is_train else 1,
        label_set=(1,),
        class_names=("veh",),
        filter_class=("TYPE_VEHICLE",),
        sampling_rate=1,
        end_epoch=36,
        lr_steps=(24, 30),
    )
