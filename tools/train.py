#!/usr/bin/env python
"""Training entry point — TPU-native replacement of the reference
tools/train.py (414 lines of Horovod/kvstore/DetModule setup): here the run is
a jitted GSPMD train step over a device mesh, with orbax checkpointing and
epoch resume.

Usage:
  python tools/train.py --config rangedet_veh_wo_aug_4_18e [--data-root ...]
  python tools/train.py --config rangedet_veh_wo_aug_4_18e --synthetic \
      --steps-per-epoch 50 --epochs 2          # no dataset needed

Data parallel is automatic over all local devices; multi-host runs call
jax.distributed.initialize (no mpirun / horovodrun wrapper needed).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train RangeDet-TPU")
    p.add_argument("--config", required=True,
                   help="recipe module name or path to a .py recipe")
    p.add_argument("--data-root", default=None, help="override cfg.data_root")
    p.add_argument("--sampling-rate", type=int, default=None,
                   help="override cfg.sampling_rate (the reference's 1/N "
                        "data subsample; 1 = use every frame)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic scenes (smoke/bench)")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--batch", type=int, default=None,
                   help="override cfg.batch_image (per-chip train batch)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="override cfg.checkpoint_every_epochs (epoch saves "
                        "are full param+opt-state orbax checkpoints; long "
                        "many-epoch runs want a sparser cadence)")
    p.add_argument("--mesh", default=None,
                   help="mesh spec like 'data=4,model=2' (default: all on data)")
    p.add_argument("--gspmd-width", action="store_true",
                   help="width-sharded meshes: use GSPMD auto-partitioning "
                        "(XLA convs) instead of the shard_map halo-exchange "
                        "path that keeps the Pallas kernels")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps at step 10")
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard scalar events (losses, lr, "
                        "frames/s, data/step timing, validation AP) under "
                        "<experiment>/<name>/tb — the optional recorder the "
                        "reference threads through fit "
                        "(utils/callback.py:20,40-46)")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--device-augment", default="",
                   help="comma list of on-device augmentations for the "
                        "--device-cache path (e.g. 'flip,rotation'): the "
                        "jnp twin of data/augment.py applied inside the "
                        "jitted step, fresh draws per step (equality-tested "
                        "vs the host ops in tests/test_device_cache.py)")
    p.add_argument("--device-cache", action="store_true",
                   help="stage the whole (packed) dataset in device HBM once "
                        "and train every epoch with zero host↔device batch "
                        "traffic (data/device_cache.py; for datasets of a "
                        "few thousand range-image frames). The loader path "
                        "(record_to_inputs) still maps every frame exactly "
                        "once, at staging time. Single-process only.")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run validation AP every N epochs (synthetic or "
                        "cfg validation split)")
    p.add_argument("--eval-frames", type=int, default=8,
                   help="validation frames per in-run eval")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--experiment-dir", default=None,
                   help="override cfg.experiment_dir (checkpoints/logs root)")
    p.add_argument("--cpu", action="store_true",
                   help="run on the host CPU backend (the environment "
                        "force-registers a tunneled TPU; env vars don't "
                        "override it — this sets jax.config in-process)")
    p.add_argument("--tiny", action="store_true",
                   help="shrink the recipe with tests/tiny.py overrides — "
                        "smoke/rehearsal mode (pairs with --cpu)")
    return p.parse_args()


def _apply_tiny(args, config_name, is_train):
    """Load a recipe, optionally shrunk with the tests/tiny.py overrides."""
    if args.tiny:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from tiny import tiny_config

        return tiny_config(config_name, is_train)
    from rangedet_tpu.configs import load_config

    return load_config(config_name, is_train)


def main():
    args = parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rangedet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.multihost:
        jax.distributed.initialize()

    from rangedet_tpu.configs import load_config
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.parallel import make_mesh, replicate_state, shard_batch
    from rangedet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from rangedet_tpu.train.schedule import build_optimizer, build_schedule
    from rangedet_tpu.train.state import create_train_state, param_count
    from rangedet_tpu.train.train_step import build_train_step_fn
    from rangedet_tpu.utils.logger import (
        DetailSpeedometer, ProfilerHook, ScalarWriter, config_logger)

    cfg = _apply_tiny(args, args.config, True)
    if args.data_root:
        cfg = cfg.replace(data_root=args.data_root)
    if args.sampling_rate is not None:
        if args.sampling_rate < 1:
            raise SystemExit("--sampling-rate must be >= 1")
        cfg = cfg.replace(sampling_rate=args.sampling_rate)
    if args.batch:
        cfg = cfg.replace(batch_image=args.batch)
    if args.epochs:
        cfg = cfg.replace(end_epoch=args.epochs)
    if args.checkpoint_every is not None:
        if args.checkpoint_every < 0:
            raise SystemExit("--checkpoint-every must be >= 0 (0 disables)")
        cfg = cfg.replace(checkpoint_every_epochs=args.checkpoint_every)
    if args.experiment_dir:
        cfg = cfg.replace(experiment_dir=args.experiment_dir)

    logger = config_logger(cfg.experiment_dir, cfg.name)
    logger.info(f"config: {cfg.name}; devices: {jax.devices()}")

    mesh_shape = cfg.mesh_shape
    if args.mesh:
        mesh_shape = {
            k: int(v) for k, v in (kv.split("=") for kv in args.mesh.split(","))
        }
    mesh = make_mesh(mesh_shape)
    n_data = mesh.shape.get("data", 1)
    global_batch = cfg.batch_image * n_data
    if cfg.auto_scale_lr:
        # linear LR scaling with global batch, as the reference's lr formula
        # (0.01/8 * num_gpus * batch * 5, config:180)
        cfg = cfg.replace(base_lr=cfg.base_lr * global_batch / 16.0)
    logger.info(
        f"mesh: {dict(mesh.shape)}; global batch: {global_batch}; "
        f"lr: {cfg.base_lr:.5f}"
    )

    # ------------------------------------------------------- multi-chip path
    # data-only meshes train under shard_map (manual sharding — required for
    # the Pallas kernels; sync-BN via in-model psum of the stat sums).
    # width ("model"-axis) sharding: the shard_map step with explicit conv
    # halo exchange (layers.width_halo_exchange) keeps the Pallas kernels
    # running; --gspmd-width falls back to GSPMD's automatic halo insertion
    # (XLA conv formulations, Pallas off).
    width_sharded = mesh.shape.get("model", 1) > 1
    if mesh.size > 1 and not width_sharded:
        cfg = cfg.replace(bn_sync_axis="data" if cfg.sync_bn else None)
    elif width_sharded and not args.gspmd_width:
        if not cfg.sync_bn:
            logger.info("width sharding forces sync-BN semantics")
        shard_w = cfg.pad_field[1] // mesh.shape["model"]
        assert shard_w % max(cfg.fpn_strides) == 0, (
            "width shards must stay phase-aligned with the FPN strides"
        )
        cfg = cfg.replace(
            width_axis="model", sync_bn=True,
            bn_sync_axis=tuple(mesh.axis_names),
        )
        if cfg.layout != "bhcw":
            logger.info("width sharding requires bhcw layout; switching")
            cfg = cfg.replace(layout="bhcw")
    elif width_sharded and (cfg.use_pallas_conv or cfg.use_pallas_meta):
        logger.info(
            "width-sharded mesh: disabling Pallas kernels (GSPMD path)"
        )
        cfg = cfg.replace(use_pallas_conv=False, use_pallas_meta=False)

    # ----------------------------------------------------------------- data
    if args.synthetic or not cfg.data_root:
        from rangedet_tpu.data.synthetic import make_batch

        steps_per_epoch = args.steps_per_epoch or 100
        logger.info("training on SYNTHETIC data")

        def epoch_batches(epoch):
            # raytraced family scenes (style="vehicles"): yaw/extent/center
            # are recoverable from the range image, so the in-training
            # validation AP is a real signal (billboard "paint" scenes have
            # unlearnable yaw and pin AP near 0 at the WOD operating point)
            for i in range(steps_per_epoch):
                yield make_batch(cfg, global_batch, seed=epoch * 10000 + i,
                                 style="vehicles")
    elif args.device_cache:
        # HBM-resident dataset: every frame flows through the exact loader
        # map (record_to_inputs) ONCE at staging time, packed ~6x smaller
        # (data/device_cache.py) and parked on device; epochs then train
        # with zero host↔device batch traffic — the TPU-native answer to
        # the tunnel's single-digit-MB/s host transfer path.
        from rangedet_tpu.data.device_cache import (
            augment_raw, expand_inputs, finalize_inputs, gather_packed,
            pack_inputs, stack_packed, unpack_raw,
        )
        from rangedet_tpu.data.waymo import load_roidbs, record_to_inputs

        if jax.process_count() != 1:
            raise SystemExit("--device-cache is single-process only")
        if cfg.augment:
            raise SystemExit(
                "--device-cache caches pre-augmentation frames; use the "
                "on-device augmentation (cfg.device_augment) instead"
            )
        roidb = load_roidbs(
            cfg.data_root, cfg.image_set, cfg.sampling_rate, cfg.filter_class
        )
        logger.info(f"loaded {len(roidb)} roidb records (device-cache mode)")
        with np.load(roidb[0]["pc_url"]) as d:
            data_w = int(d["range_image"].shape[1])

        t0 = time.time()
        packed = [
            pack_inputs(record_to_inputs(rec, cfg.pad_field, cfg.max_gt_boxes))
            for rec in roidb
        ]
        cache_host = stack_packed(packed)
        del packed
        map_s = time.time() - t0
        t0 = time.time()
        cache = {}
        staged_mb = 0.0
        for k, v in cache_host.items():
            cache[k] = jax.device_put(v)
            staged_mb += v.nbytes / 1e6
        # force completion with a scalar fetch (block_until_ready is
        # unreliable on the tunneled backend — CLAUDE.md)
        float(jnp.sum(cache["flags"][0].astype(jnp.int32)))
        del cache_host
        logger.info(
            f"device cache staged: {len(roidb)} frames, {staged_mb:.0f} MB "
            f"(map {map_s:.0f}s, transfer {time.time() - t0:.0f}s = "
            f"{staged_mb / max(time.time() - t0, 1e-9):.1f} MB/s)"
        )
        n_frames = len(roidb)
        steps_per_epoch = args.steps_per_epoch or n_frames // global_batch

        def epoch_batches(epoch):
            order = np.random.RandomState(
                args.seed * 100003 + epoch
            ).permutation(n_frames)
            for s in range(steps_per_epoch):
                lo = (s * global_batch) % max(n_frames - global_batch + 1, 1)
                idx = order[lo : lo + global_batch]
                yield jnp.asarray(idx, jnp.int32)
    else:
        from rangedet_tpu.data.loader import BatchLoader
        from rangedet_tpu.data.waymo import load_roidbs, record_to_inputs

        roidb = load_roidbs(
            cfg.data_root, cfg.image_set, cfg.sampling_rate, cfg.filter_class
        )
        logger.info(f"loaded {len(roidb)} roidb records")
        loader = BatchLoader(
            roidb,
            lambda rec: record_to_inputs(
                rec, cfg.pad_field, cfg.max_gt_boxes, augment=cfg.augment
            ),
            batch_size=global_batch,
            num_workers=args.num_workers,
            host_id=jax.process_index(),
            num_hosts=jax.process_count(),
        )
        steps_per_epoch = args.steps_per_epoch or len(loader)

        def epoch_batches(epoch):
            return loader.epoch()

    # ---------------------------------------------------------------- model
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, steps_per_epoch)
    sched = build_schedule(cfg, steps_per_epoch)

    if args.synthetic or not cfg.data_root:
        sample = make_sample(cfg, global_batch)
    elif args.device_cache:
        # the cache is an explicit ARGUMENT everywhere (closing over device
        # arrays would bake 3.8 GB of lowered constants into the program)
        sample_expand = jax.jit(
            lambda c, idx: expand_inputs(gather_packed(c, idx), data_w)
        )
        sample = sample_expand(cache, next(iter(epoch_batches(0))))
    else:
        sample = next(iter(epoch_batches(0)))
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(args.seed), sample
    )
    logger.info(f"params: {param_count(state) / 1e6:.2f}M")

    begin_epoch = cfg.begin_epoch
    if args.resume:
        state, ep = restore_checkpoint(state, cfg)
        if ep is not None:
            begin_epoch = ep + 1
            logger.info(f"resumed from epoch {ep}")

    state = replicate_state(state, mesh)
    # cfg.sync_bn selects GSPMD sync-BN or the shard_map local-BN parity step
    base_step_fn = build_train_step_fn(model, cfg, mesh)
    if args.device_cache and cfg.data_root and not args.synthetic:
        aug_names = tuple(
            n for n in args.device_augment.split(",") if n
        )

        def cached_step(state, c, idx):
            raw = unpack_raw(gather_packed(c, idx), data_w)
            if aug_names:
                akey = jax.random.fold_in(
                    jax.random.PRNGKey(args.seed + 7), state.step)
                raw = augment_raw(raw, data_w, key=akey, names=aug_names)
            batch = finalize_inputs(raw)
            return base_step_fn(state, batch)

        _cached = jax.jit(cached_step, donate_argnums=0)
        train_step = lambda state, idx: _cached(state, cache, idx)  # noqa: E731
    else:
        train_step = jax.jit(base_step_fn, donate_argnums=0)

    tb = None
    if args.tensorboard and jax.process_index() == 0:
        tb = ScalarWriter(
            os.path.join(cfg.experiment_dir, cfg.name, "tb"), logger)
    speedometer = DetailSpeedometer(
        global_batch, cfg.log_frequency, logger, tb=tb)
    profiler = ProfilerHook(
        os.path.join(cfg.experiment_dir, cfg.name, "traces"), 10, args.profile_steps
    )

    from rangedet_tpu.data.prefetch import device_prefetch, threaded_prefetch

    # ----------------------------------------------------------------- loop
    val_fn = None
    global_step = begin_epoch * steps_per_epoch
    for epoch in range(begin_epoch, cfg.end_epoch):
        t_ep = time.time()
        if args.device_cache and cfg.data_root and not args.synthetic:
            # batches are device-resident; only tiny index vectors move
            batches = iter(epoch_batches(epoch))
        else:
            batches = device_prefetch(
                threaded_prefetch(iter(epoch_batches(epoch)), depth=2),
                put=lambda b: shard_batch(b, mesh),
                depth=2,
            )
        it = iter(batches)
        i = 0
        _end = object()
        # Steps chain through the donated TrainState with NO per-step fetch
        # (bench.py's steady-state dispatch); the window below is fetched in
        # ONE round-trip per log_frequency steps. Each float() costs a ~33 ms
        # tunnel round-trip (BENCH.md dispatch floor) — the old loop fetched
        # every metric plus the lr per step, 8 round-trips that more than
        # doubled the device-cache step time (394 ms observed vs ~180 ms
        # compute).
        pending = []  # rows of (batch_idx, global_step, device metrics dict)

        def flush():
            if not pending:
                return
            t_f = time.time()
            keys = sorted(pending[0][2])
            flat = jnp.stack([m[k] for _, _, m in pending for k in keys])
            vals = np.asarray(flat).reshape(len(pending), len(keys))
            speedometer.tick(0.0, time.time() - t_f)  # window sync -> step time
            for r, (bi, gs, _) in enumerate(pending):
                lr = float(sched(gs)) if speedometer.due_next else None
                speedometer(epoch, bi, dict(zip(keys, vals[r])),
                            lr=lr, global_step=gs)
            pending.clear()

        while True:
            t0 = time.time()
            batch = next(it, _end)
            if batch is _end:
                break
            t1 = time.time()
            profiler(global_step)
            state, metrics = train_step(state, batch)
            speedometer.tick(t1 - t0, time.time() - t1)
            pending.append((i, global_step, metrics))
            if len(pending) >= cfg.log_frequency:
                flush()
            global_step += 1
            i += 1
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
        flush()
        jax.block_until_ready(state.params)
        logger.info(f"epoch {epoch} done in {time.time() - t_ep:.1f}s")
        if (jax.process_index() == 0 and cfg.checkpoint_every_epochs
                and (epoch + 1) % cfg.checkpoint_every_epochs == 0):
            path = save_checkpoint(state, cfg, epoch)
            logger.info(f"checkpoint: {path}")
        if args.eval_every and (epoch + 1) % args.eval_every == 0:
            if val_fn is None:
                val_fn = build_validation(model, cfg, args,
                                          n_frames=args.eval_frames)
            val = val_fn(state)
            logger.info(f"epoch {epoch} validation: {val}")
            if tb is not None:
                tb.scalars({f"val/{name}_ap": m["ap"]
                            for name, m in val.items()}, global_step)
        if tb is not None:
            tb.flush()
    if tb is not None:
        tb.close()
    logger.info("training complete")


def build_validation(model, cfg, args, n_frames=8):
    """Build a reusable in-process validation runner: synthetic scenes when
    no dataset, else the first frames of the validation split (device-cached
    when --device-cache, so repeated evals move no frame data). The jitted
    eval fns are built ONCE here — per-epoch calls reuse the same trace."""
    import jax.numpy as jnp
    import numpy as np

    from rangedet_tpu.eval.evaluator import evaluate
    from rangedet_tpu.train.train_step import build_eval_inputs, make_eval_step

    cfg_t = cfg.replace(is_train=False)
    eval_step = jax.jit(make_eval_step(model, cfg_t))
    prep = jax.jit(lambda b: build_eval_inputs(b, cfg_t))
    enum_of = {"veh": 1.0, "ped": 2.0, "cyc": 4.0}

    if args.synthetic or not cfg.data_root:
        from rangedet_tpu.data.synthetic import make_batch

        def frames():
            for i in range(n_frames):
                b = make_batch(cfg_t, 1, seed=90000 + i, num_boxes=8,
                               style="vehicles")
                valid = b["gt_valid"][0] > 0
                gt = {
                    name: b["gt_csa"][0][
                        valid & (b["gt_class"][0] == enum_of.get(name, 1.0))
                    ]
                    for name in cfg.class_names
                }
                yield b, gt
    else:
        from rangedet_tpu.data.waymo import load_roidbs, record_to_inputs

        roidb = load_roidbs(cfg.data_root, "validation", 1, cfg.filter_class)
        roidb = roidb[:n_frames]

        def gt_of(rec):
            cls = np.asarray(rec.get("gt_class", np.zeros(0))).reshape(-1)
            csa = np.asarray(
                rec.get("gt_bbox_csa", np.zeros((0, 7)))).reshape(-1, 7)
            return {
                name: csa[cls == enum_of.get(name, 1.0)]
                for name in cfg.class_names
            }

        if args.device_cache:
            from rangedet_tpu.data.device_cache import (
                expand_inputs, gather_packed, pack_inputs, stack_packed,
            )

            with np.load(roidb[0]["pc_url"]) as d:
                data_w = int(d["range_image"].shape[1])
            vcache = {
                k: jax.device_put(v) for k, v in stack_packed([
                    pack_inputs(record_to_inputs(
                        rec, cfg.pad_field, cfg.max_gt_boxes))
                    for rec in roidb
                ]).items()
            }
            expand1 = jax.jit(lambda c, i: expand_inputs(
                gather_packed(c, i[None]), data_w))

            def frames():
                for i, rec in enumerate(roidb):
                    yield expand1(vcache, jnp.int32(i)), gt_of(rec)
        else:

            def frames():
                for rec in roidb:
                    b = record_to_inputs(rec, cfg.pad_field, cfg.max_gt_boxes)
                    yield {k: v[None] for k, v in b.items()}, gt_of(rec)

    def run(state):
        # WOD-standard operating point (veh 0.7 / ped 0.5 / cyc 0.5 at 3D
        # IoU) — the metric definition behind the reference's headline table
        # (README.md:73-76, create_prediction_bin_3d.py:26-60)
        return evaluate(
            state, model, cfg_t, frames(),
            iou_thresh=cfg.eval_iou_thresh, mode=cfg.eval_iou_mode,
            eval_step=eval_step, prep=prep,
        )

    return run


def make_sample(cfg, global_batch):
    from rangedet_tpu.data.synthetic import make_batch

    return make_batch(cfg, global_batch, seed=0)


if __name__ == "__main__":
    main()
