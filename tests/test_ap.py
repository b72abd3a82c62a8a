"""AP evaluator sanity: perfect detections -> AP 1, misses -> lower."""
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
