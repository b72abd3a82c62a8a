"""AP evaluator sanity: perfect detections -> AP 1, misses -> lower."""
import pytest
import numpy as np

from rangedet_tpu.eval.ap import average_precision, match_frame
from conftest import random_csa


def test_perfect_detections(rng):
    gt = random_csa(rng, 10)
    frames = [dict(det_csa=gt, det_scores=np.linspace(1, 0.5, 10), gt_csa=gt)]
    res = average_precision(frames, iou_thresh=0.7, mode="bev")
    assert res["ap"] > 0.99
    assert res["recall"] == 1.0


def test_false_positives_lower_ap(rng):
    gt = random_csa(rng, 5)
    fp = random_csa(rng, 5, center_scale=200.0)  # far away, no overlap
    det = np.concatenate([gt, fp])
    # false positives scored HIGHER than true positives drag AP down
    scores = np.concatenate([np.full(5, 0.5), np.full(5, 0.9)])
    frames = [dict(det_csa=det, det_scores=scores, gt_csa=gt)]
    res = average_precision(frames, iou_thresh=0.7, mode="bev")
    assert 0.2 < res["ap"] < 0.9


def test_missed_gt_caps_recall(rng):
    gt = random_csa(rng, 10)
    frames = [dict(det_csa=gt[:5], det_scores=np.ones(5), gt_csa=gt)]
    res = average_precision(frames, iou_thresh=0.7, mode="bev")
    assert abs(res["recall"] - 0.5) < 1e-6
    assert res["ap"] < 0.6


def test_match_frame_greedy_by_score(rng):
    gt = random_csa(rng, 1)
    det = np.concatenate([gt, gt])  # two identical dets, one GT
    tp, n = match_frame(det, np.array([0.3, 0.9]), gt, 0.7, "bev")
    assert n == 1
    assert tp.tolist() == [False, True]  # higher score wins the single GT


def test_3d_mode(rng):
    gt = random_csa(rng, 6)
    shifted = gt.copy()
    shifted[:, 2] += gt[:, 5]  # move up by one height: no 3D overlap
    frames = [dict(det_csa=shifted, det_scores=np.ones(6), gt_csa=gt)]
    res = average_precision(frames, iou_thresh=0.3, mode="3d")
    assert res["ap"] < 0.05


def test_heading_accuracy_weights():
    from rangedet_tpu.eval.ap import heading_accuracy

    np.testing.assert_allclose(heading_accuracy(0.0, 0.0), 1.0)
    np.testing.assert_allclose(heading_accuracy(np.pi, 0.0), 0.0, atol=1e-7)
    np.testing.assert_allclose(heading_accuracy(0.0, np.pi / 2), 0.5)
    # wrapping: 2pi apart == aligned
    np.testing.assert_allclose(heading_accuracy(2 * np.pi, 0.0), 1.0, atol=1e-7)
    np.testing.assert_allclose(heading_accuracy(-np.pi / 2, np.pi / 2), 0.0,
                               atol=1e-7)


def test_gt_difficulty_rule():
    from rangedet_tpu.eval.ap import gt_difficulty

    pts = np.array([0, 1, 5, 6, 100])
    np.testing.assert_array_equal(gt_difficulty(pts), [0, 2, 2, 1, 1])
    manual = np.array([0, 0, 0, 2, 0])  # labeler marks box 3 as LEVEL_2
    np.testing.assert_array_equal(gt_difficulty(pts, manual), [0, 2, 2, 2, 1])
    # a manual LEVEL_1 on a sparse box overrides the <=5-points fallback
    # (WOD uses the labeler level whenever it is set)
    manual = np.array([0, 1, 1, 0, 2])
    np.testing.assert_array_equal(gt_difficulty(pts, manual), [0, 1, 1, 1, 2])


def test_waymo_metrics_perfect_is_1(rng):
    from rangedet_tpu.eval.ap import waymo_metrics

    gt = random_csa(rng, 8)
    frames = [dict(det_csa=gt, det_scores=np.linspace(1, 0.5, 8), gt_csa=gt,
                   gt_num_points=np.full(8, 50))]
    res = waymo_metrics(frames, iou_thresh=0.7, mode="bev")
    assert res["L1"]["ap"] > 0.99 and res["L1"]["aph"] > 0.99
    assert res["L2"]["ap"] > 0.99


def test_waymo_aph_penalizes_heading(rng):
    from rangedet_tpu.eval.ap import waymo_metrics

    gt = random_csa(rng, 8)
    gt[:, 0] = np.arange(8) * 30.0  # well separated: no cross-GT overlap
    gt[:, 1] = 0.0
    gt[:, 3] = gt[:, 4]  # square boxes: yaw flip leaves IoU = 1
    det = gt.copy()
    det[:, 6] += np.pi / 2  # 90 deg heading error on every det
    frames = [dict(det_csa=det, det_scores=np.linspace(1, 0.5, 8), gt_csa=gt,
                   gt_num_points=np.full(8, 50))]
    res = waymo_metrics(frames, iou_thresh=0.5, mode="bev")
    assert res["L1"]["ap"] > 0.99        # still spatial TPs
    assert abs(res["L1"]["aph"] - 0.5) < 0.02  # each TP weighted 0.5


def test_waymo_l1_l2_split(rng):
    from rangedet_tpu.eval.ap import waymo_metrics

    gt = random_csa(rng, 6)
    pts = np.array([50, 50, 50, 3, 3, 0])  # 3 L1, 2 L2, 1 excluded
    # detect only the three L1 boxes
    frames = [dict(det_csa=gt[:3], det_scores=np.ones(3), gt_csa=gt,
                   gt_num_points=pts)]
    res = waymo_metrics(frames, iou_thresh=0.7, mode="bev")
    assert res["L1"]["ap"] > 0.99                 # all L1 GTs found
    assert abs(res["L2"]["recall"] - 3 / 5) < 1e-6  # 3 of 5 evaluated GTs

    # a det on an L2 box must not count as FP for L1 (ignore, not penalize)
    frames2 = [dict(det_csa=gt[:4], det_scores=np.ones(4), gt_csa=gt,
                    gt_num_points=pts)]
    res2 = waymo_metrics(frames2, iou_thresh=0.7, mode="bev")
    assert res2["L1"]["ap"] > 0.99
    # empty-box (0 points) det is dropped for L2 as well
    frames3 = [dict(det_csa=gt, det_scores=np.ones(6), gt_csa=gt,
                    gt_num_points=pts)]
    res3 = waymo_metrics(frames3, iou_thresh=0.7, mode="bev")
    assert res3["L2"]["ap"] > 0.99


@pytest.mark.heavy
def test_evaluate_wod_operating_point(rng):
    # run_validation's defaults (tools/train.py): per-class 3D-IoU
    # thresholds through the in-process evaluator on the fused eval path
    import jax
    import jax.numpy as jnp
    import sys

    sys.path.insert(0, "tests")
    from tiny import tiny_config
    from rangedet_tpu.data.synthetic import make_batch
    from rangedet_tpu.eval.evaluator import evaluate
    from rangedet_tpu.models import RangeDet
    from rangedet_tpu.train.schedule import build_optimizer
    from rangedet_tpu.train.state import create_train_state

    cfg = tiny_config(is_train=False)
    model = RangeDet(**cfg.model_kwargs())
    tx, _ = build_optimizer(cfg, 10)
    b0 = make_batch(cfg, 1, seed=1, num_boxes=4)
    state = create_train_state(
        model, cfg, tx, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in b0.items()},
    )

    def frames():
        for i in range(2):
            b = make_batch(cfg, 1, seed=100 + i, num_boxes=4)
            gt = b["gt_csa"][0][b["gt_valid"][0] > 0]
            npts = np.full((len(gt),), 10)
            yield b, {cfg.class_names[0]: dict(gt_csa=gt, gt_num_points=npts)}

    res = evaluate(
        state, model, cfg, frames(),
        iou_thresh=cfg.eval_iou_thresh, mode=cfg.eval_iou_mode,
        metric="waymo",
    )
    m = res[cfg.class_names[0]]
    assert set(m) == {"L1", "L2"}
    for lvl in ("L1", "L2"):
        assert 0.0 <= m[lvl]["ap"] <= 1.0 and 0.0 <= m[lvl]["aph"] <= m[lvl]["ap"] + 1e-9


def test_hungarian_matches_greedy_on_perfect(rng):
    from rangedet_tpu.eval.ap import waymo_metrics, waymo_metrics_hungarian

    gt = random_csa(rng, 8)
    frames = [dict(det_csa=gt, det_scores=np.linspace(1, 0.5, 8), gt_csa=gt,
                   gt_num_points=np.full(8, 50))]
    g = waymo_metrics(frames, iou_thresh=0.7, mode="bev")
    h = waymo_metrics_hungarian(frames, iou_thresh=0.7, mode="bev")
    assert h["L1"]["ap"] > 0.99 and h["L1"]["aph"] > 0.99
    assert abs(h["L1"]["ap"] - g["L1"]["ap"]) < 0.01


def test_greedy_vs_hungarian_bound_crowded(rng):
    """VERDICT #7: bound the greedy matcher's |dAP| vs the WOD-construction
    Hungarian sweep on CROWDED scenes (clusters of overlapping GTs with
    jittered, score-shuffled detections) — the regime where greedy can
    mis-assign. The published target tolerance is 0.5 AP; assert well under
    half of it at the veh operating point (3D-ish crowding via BEV 0.7)."""
    from rangedet_tpu.eval.ap import waymo_metrics, waymo_metrics_hungarian

    frames = []
    for f in range(6):
        # clusters: 4 groups of 4 boxes with heavy mutual overlap
        centers = rng.uniform(-40, 40, (4, 2))
        gts, dets, scores = [], [], []
        for g in range(4):
            for k in range(4):
                l, w = rng.uniform(3.8, 5.2), rng.uniform(1.7, 2.1)
                cx, cy = centers[g] + rng.uniform(-2.0, 2.0, 2)
                yaw = rng.uniform(-np.pi, np.pi)
                gt = [cx, cy, 0.0, l, w, 1.7, yaw]
                gts.append(gt)
                # imperfect detection of each GT + one duplicate per cluster
                d = np.asarray(gt, np.float64)
                d[:2] += rng.uniform(-0.4, 0.4, 2)
                d[6] += rng.uniform(-0.15, 0.15)
                dets.append(d)
                scores.append(rng.uniform(0.3, 1.0))
            dets.append(np.asarray(gts[-1], np.float64) +
                        rng.uniform(-0.3, 0.3, 7))
            scores.append(rng.uniform(0.3, 1.0))
        frames.append(dict(
            det_csa=np.asarray(dets, np.float32),
            det_scores=np.asarray(scores, np.float32),
            gt_csa=np.asarray(gts, np.float32),
            gt_num_points=np.full(len(gts), 50),
        ))

    for thr in (0.5, 0.7):
        g = waymo_metrics(frames, iou_thresh=thr, mode="bev")
        h = waymo_metrics_hungarian(frames, iou_thresh=thr, mode="bev")
        for lvl in ("L1", "L2"):
            assert abs(g[lvl]["ap"] - h[lvl]["ap"]) < 0.02, (thr, lvl, g, h)
            assert abs(g[lvl]["aph"] - h[lvl]["aph"]) < 0.02, (thr, lvl, g, h)


def test_range_breakdown_buckets():
    """WOD RANGE breakdown: near boxes detected / far boxes missed gives
    near-bucket AP 1, far-bucket AP 0, and far misses don't pollute the
    near bucket (cross-bucket GTs are ignore-set, out-of-bucket FPs are
    assigned by detection range)."""
    from rangedet_tpu.eval.ap import range_breakdown

    def box(x, y):
        return [x, y, 0.0, 4.0, 2.0, 1.6, 0.0]

    # two near GTs (r=10, 20) detected perfectly; one far GT (r=60) missed;
    # plus one far FP (r=70)
    frames = [dict(
        det_csa=np.asarray([box(10, 0), box(0, 20), box(70, 0)], np.float32),
        det_scores=np.asarray([0.9, 0.8, 0.7], np.float32),
        gt_csa=np.asarray([box(10, 0), box(0, 20), box(60, 0)], np.float32),
        gt_num_points=np.full(3, 50),
    )]
    out = range_breakdown(frames, iou_thresh=0.7, mode="bev")
    assert out["[0, 30)"]["ap"] > 0.99, out
    assert out["[0, 30)"]["recall"] == 1.0
    assert out["[30, 50)"]["ap"] == 0.0  # no GT in bucket
    assert out["[50, inf)"]["ap"] == 0.0  # GT missed, FP present
    assert out["[50, inf)"]["recall"] == 0.0
