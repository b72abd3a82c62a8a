"""Wide-channel vehicle recipe: the parity architecture with channel widths
raised to the v5e MXU's preferred ≥128 lanes.

Measured on chip: 64-channel full-width convs sustain ~12 TF/s fwd+bwd while
256-channel convs sustain ~75 TF/s — the reference's 64-wide stages leave the
MXU mostly idle, so doubling widths costs ~4× FLOPs but only ~1.3× wall time.
This is the capacity/accuracy knob (strictly more model than the published
one); the parity-exact recipe remains rangedet_veh_wo_aug_all_36e.
"""
from rangedet_tpu.configs.base import RangeDetConfig


def get_config(is_train: bool) -> RangeDetConfig:
    return RangeDetConfig(
        name="rangedet_veh_tpuopt_all_36e",
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
        num_filter={
            "res1": 128, "res2a": 128, "res2": 256, "res3a": 256, "res3": 256,
            "agg1": 128, "agg2": 256, "agg2a": 128, "agg3": 128,
        },
        meta_units={"res1_unit2": dict(channel_list=(32, 128))},
    )
