"""RangeDetConfig — the single structured recipe object.

Replaces the reference's 14-tuple of nested param classes returned by each
config module (config/rangedet/rangedet_veh_wo_aug_4_18e.py:30-423) with one
dataclass; recipe modules still expose ``get_config(is_train)`` so users keep
the same "config is an importable python recipe" workflow.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class RangeDetConfig:
    # ------------------------------------------------------------- general
    name: str = "rangedet"
    is_train: bool = True
    batch_image: int = 2  # per-chip batch (reference config:32)
    log_frequency: int = 100
    feat_size: Tuple[int, int] = (64, 2650)
    pad_field: Tuple[int, int] = (64, 2656)
    label_set: Sequence[int] = (1,)  # Waymo enum values (1=veh, 2=ped, 4=cyc)
    class_names: Sequence[str] = ("veh",)

    # ------------------------------------------------------------- pyramid
    fpn_strides: Sequence[int] = (1, 2, 4)
    fpn_intervals: Dict[int, Tuple[float, float]] = dataclasses.field(
        default_factory=lambda: {1: (30, 100), 2: (15, 30), 4: (0, 15)}
    )

    # ------------------------------------------------------------- model
    num_block: Optional[Dict[str, int]] = None  # None -> DLA defaults
    num_filter: Optional[Dict[str, int]] = None
    meta_units: Optional[Dict[str, dict]] = None  # None -> res1_unit2 default
    add_data_sc: bool = True
    num_reg_delta: int = 8
    cls_conv_layers: int = 4
    cls_conv_channel: int = 128
    reg_conv_layers: int = 4
    reg_conv_channel: int = 128
    dtype: Any = jnp.bfloat16
    use_pallas_meta: bool = False
    use_pallas_conv: bool = True  # Pallas conv3x3 kernels (layout="bhcw")
    remat: bool = False  # jax.checkpoint over backbone stages (memonger equiv)
    # recompute the 9C Meta-Kernel tensor in backward; default OFF — the
    # (B,H,W,9C) activation fits v5e HBM comfortably and keeping it saves
    # 7.4 ms/step (measured); enable for memory-constrained runs
    remat_meta: bool = False
    # "planar" runs the conv stack (incl. phase-decomposed deconvs) in
    # (B, C, H, W) as shifted channel-matmuls: ~9% faster train step; NHWC is
    # faster at batch-1 inference, so recipes train planar and eval nhwc —
    # models/convert.py moves checkpoints between layouts exactly
    layout: str = "nhwc"

    # ------------------------------------------------------------- loss
    vfl_alpha: float = 1.0
    vfl_gamma: float = 2.0
    cls_loss_weight: float = 10.0
    reg_loss_weight: float = 8.0
    smooth_l1_scalar: float = 3.0
    l1_loss: bool = False
    reg_dim_weights: Sequence[float] = (3, 1, 1, 1, 1, 1, 1, 1)
    # exact-IoU candidates per pixel for the IoU-aware cls target; the dense
    # reference equivalent is len(gt)=200, 24 is exact in practice (see
    # ops/rotated_iou.max_iou_vs_gt); 0 = dense
    iou_topk_gt: int = 24
    # pixel-chunked IoU-target evaluation bounds transient HBM (see
    # max_iou_vs_gt); 0 = unchunked
    iou_chunk: int = 8192
    # fused Pallas IoU-target kernel (ops/iou_target_pallas.py); the XLA
    # chunked path is the oracle/fallback
    use_pallas_iou: bool = True

    # ------------------------------------------------------------- targets
    max_gt_boxes: int = 200  # GetFixedLengthGTBbox pad (config:286)
    assign_radius_sq: float = 100.0
    assign_max_dist_sq: float = 20.0

    # ------------------------------------------------------------- test
    # reference candidate cap before min_score filtering (config:138 via
    # get_sorted_foreground.py:11-40); consumed by run_inference as the
    # semantic upper bound on the candidate set
    pre_nms_top_n: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"veh": 50000, "ped": 5000, "cyc": 5000}
    )
    # candidates actually carried into the on-device WNMS: the reference
    # filters score > min_score BEFORE its host WNMS (tools/test.py:200-211),
    # so outputs match exactly while the above-threshold pixel count fits in
    # min(device_topk, pre_nms_top_n); run_inference returns a per-frame
    # "truncated" flag for the frames where the cap binds
    device_topk: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"veh": 4096, "ped": 4096, "cyc": 4096}
    )
    post_nms_top_n: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"veh": 200, "ped": 200, "cyc": 100}
    )
    min_score: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {"veh": 0.5, "ped": 0.4, "cyc": 0.3}
    )
    # in-training validation matches the WOD metric definition the reference
    # reports against (README.md:73-76): 3D IoU, veh 0.7 / ped 0.5 / cyc 0.5
    eval_iou_thresh: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {"veh": 0.7, "ped": 0.5, "cyc": 0.5}
    )
    eval_iou_mode: str = "3d"
    # candidate selection: "argsort" (exact, full sort — the v5e TopkEmitter
    # crashes on lax.top_k/approx_max_k over the fused 297k score vector),
    # "approx" (lax.approx_max_k), or "exact" (lax.top_k)
    topk_method: str = "argsort"
    wnms_thr_lo: float = 0.1
    wnms_thr_hi: float = 0.5
    wnms_is_3d: bool = False
    # per-chunk exact-IoU candidate bound (device analogue of the C++
    # spatial-hash prefilter, nms.h:252-307): each greedy round clips against
    # the circumcircle-overlapping candidates in nearest-first chunks of this
    # size until exhausted — exact unconditionally; crowded rounds just run
    # extra chunks. 0 = single full row per round (slow worst case: ~4x the
    # per-round cost at 4096 candidates)
    wnms_prefilter_topm: int = 512
    # blocked greedy sweep: select the next N alive candidates with one
    # top_k and batch their exact IoU rows as a (N, K) clip, resolving the
    # greedy chain in-block (ops/nms.py weighted_nms(block=...)). Exact;
    # amortises the per-round selection machinery the serial form pays.
    # On-chip A/B at full candidate load (4096 valid, v5e): serial 64.7 ms
    # -> block16 42.3 ms; block16 is the flat minimum of {4,8,16,32}.
    # 0 = serial rounds (chunked circumcircle prefilter above applies)
    wnms_block: int = 16
    max_det_per_image: int = 100

    # ------------------------------------------------------------- optimize
    optimizer: str = "sgd"
    base_lr: float = 0.01 / 8 * 8 * 2 * 5  # reference config:180 (8 chips, b2)
    # reference LR formula scales with #gpus × batch (config:180); when True
    # the runner rescales base_lr by global_batch / 16 (the 8-chip, b2 value)
    auto_scale_lr: bool = True
    momentum: float = 0.9
    weight_decay: float = 1e-5
    clip_gradient: float = 35.0
    clip_mode: str = "elementwise"  # MXNet clip_gradient semantics; or "global_norm"
    lr_mode: str = "cosine"
    begin_epoch: int = 0
    end_epoch: int = 18
    lr_steps: Sequence[int] = (12, 15)
    warmup_epochs: float = 2.0
    warmup_lr: float = 0.0
    # OneCycle recipe knobs (utils/train_utils.py:28-93 defaults): with
    # lr_mode="onecycle" the LR cosine-cycles low→peak→low/1e4 and the
    # momentum/beta1 counter-cycles moms[0]→moms[1]→moms[0]
    onecycle_div_factor: float = 10.0
    onecycle_pct_start: float = 0.4
    onecycle_moms: Tuple[float, float] = (0.95, 0.85)
    adam_beta2: float = 0.999

    # ------------------------------------------------------------- data
    data_root: str = ""
    image_set: Any = ("training",)
    sampling_rate: int = 4
    filter_class: Sequence[str] = ("TYPE_VEHICLE",)
    loader_workers: int = 8
    # training-time geometric augmentations by name ("flip", "rotation") —
    # data/augment.py; the reference ships its equivalents disabled
    # (config:223-239 commented out), so parity recipes keep this empty
    augment: Sequence[str] = ()

    # ------------------------------------------------------------- parallel
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {"data": 4, "model": 2}
    sync_bn: bool = True  # global BN; False = per-replica ("localbn") stats
    # set by the trainer for the shard_map multi-chip path: BatchNorm psums
    # its (sum, sum-sq, count) over this mesh axis — exact sync-BN under
    # manual sharding, where the Pallas kernels keep running per-shard
    # (pallas_call cannot ride GSPMD's auto partitioner)
    bn_sync_axis: Any = None
    # width_axis: bound mesh axis name the range-image width is sharded over
    # (shard_map width sharding with explicit conv halo exchange — the path
    # that lets the Pallas kernels run on width-sharded meshes; bhcw only).
    # Set by tools/train.py for width meshes; None = unsharded/GSPMD width.
    width_axis: Any = None

    # ------------------------------------------------------------- io
    experiment_dir: str = "experiments"
    checkpoint_every_epochs: int = 1

    @property
    def num_classes(self) -> int:
        return len(self.label_set)

    def model_kwargs(self) -> dict:
        return dict(
            fpn_strides=tuple(self.fpn_strides),
            num_classes=self.num_classes,
            num_reg_delta=self.num_reg_delta,
            num_block=self.num_block,
            num_filter=self.num_filter,
            meta_units=self.meta_units,
            add_data_sc=self.add_data_sc,
            cls_conv_layers=self.cls_conv_layers,
            cls_conv_channel=self.cls_conv_channel,
            reg_conv_layers=self.reg_conv_layers,
            reg_conv_channel=self.reg_conv_channel,
            dtype=self.dtype,
            use_pallas_meta=self.use_pallas_meta,
            use_pallas_conv=self.use_pallas_conv,
            remat=self.remat,
            remat_meta=self.remat_meta,
            layout=self.layout,
            bn_sync_axis=self.bn_sync_axis,
            width_axis=self.width_axis,
        )

    def replace(self, **kw) -> "RangeDetConfig":
        return dataclasses.replace(self, **kw)
