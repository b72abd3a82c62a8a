"""Tiny config overrides shared by model/train tests: small spatial size and a
thin backbone so jit+step runs in seconds on CPU while exercising every path
(meta kernel, all strides, aggregation, head, targets, losses, WNMS)."""
from rangedet_tpu.configs import load_config

TINY_NUM_BLOCK = {
    "res1": 2, "res2a": 1, "res2": 1, "res3a": 1, "res3": 1,
    "agg1": 1, "agg2": 1, "agg2a": 1, "agg3": 1,
}
TINY_NUM_FILTER = {
    "res1": 16, "res2a": 16, "res2": 32, "res3a": 32, "res3": 32,
    "agg1": 16, "agg2": 32, "agg2a": 16, "agg3": 16,
}
TINY_META = {"res1_unit2": dict(channel_list=(8, 16))}


def tiny_config(name="rangedet_veh_wo_aug_4_18e", is_train=True, **overrides):
    cfg = load_config(name, is_train)
    defaults = dict(
        feat_size=(16, 128),
        pad_field=(16, 128),
        max_gt_boxes=32,
        num_block=dict(TINY_NUM_BLOCK),
        num_filter=dict(TINY_NUM_FILTER),
        meta_units={"res1_unit2": dict(channel_list=(8, 16))},
        cls_conv_layers=1,
        cls_conv_channel=32,
        reg_conv_layers=1,
        reg_conv_channel=32,
        device_topk={"veh": 256, "ped": 256, "cyc": 256},
        iou_topk_gt=8,
        # tests default to one layout to keep CPU compile time bounded; the
        # planar path is covered by test_convert + test_planar_* explicitly
        layout="nhwc",
        # recipes ship the fused Meta-Kernel block (bhcw/TPU); in tiny CPU
        # tests it would route the nhwc interpret kernel — covered instead
        # by tests/test_meta_block_pallas.py / test_meta_kernel.py
        use_pallas_meta=False,
    )
    defaults.update(overrides)
    return cfg.replace(**defaults)
