"""Cyclist-only, 1/4 data, 18 epochs, no augmentation.

The reference ships only veh/ped recipes (config/rangedet/), but its WOD
operating-point table and class plumbing cover cyclists (TYPE_CYCLIST=4,
post_nms 100 / min_score 0.3 / eval 3D IoU 0.5 — config:98-106 in base.py
mirror the reference's per-class dicts), so this recipe completes the
class family the same way rangedet_multiclass_all_36e does jointly.
"""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_cyc_wo_aug_4_18e",
        is_train=is_train,
        layout="bhcw",
        use_pallas_meta=True,
        batch_image=2 if is_train else 1,
        label_set=(4,),
        class_names=("cyc",),
        filter_class=("TYPE_CYCLIST",),
        sampling_rate=4,
        end_epoch=18,
        lr_steps=(12, 15),
    )
