"""Weighted NMS and greedy NMS vs the numpy oracle of the C++ wnms_4c."""
import numpy as np
import jax.numpy as jnp

from rangedet_tpu.ops import boxes, nms
from conftest import random_csa
import oracles


def _make_dets(rng, n, scale=8.0):
    csa = random_csa(rng, n, center_scale=scale)
    corners = np.asarray(boxes.csa_to_corners_bev(jnp.asarray(csa))).reshape(n, 8)
    yaw = csa[:, 6:7]
    bottom = (csa[:, 2] - csa[:, 5] / 2)[:, None]
    height = csa[:, 5:6]
    score = rng.uniform(0.05, 1.0, (n, 1)).astype(np.float32)
    return np.concatenate([corners, yaw, bottom, height, score], axis=1).astype(
        np.float32
    )


def test_wnms_matches_oracle(rng):
    n = 60
    dets = _make_dets(rng, n, scale=6.0)
    # add clusters of near-duplicates to exercise voting
    for k in range(0, 20, 4):
        dets[k + 1 : k + 4] = dets[k]
        dets[k + 1 : k + 4, :8] += rng.uniform(-0.15, 0.15, (3, 8))
        dets[k + 1 : k + 4, 11] = rng.uniform(0.05, 1.0, 3)

    want, want_inds = oracles.wnms_oracle(dets, thresh=0.1, thresh_vote=0.5)

    out12, out_valid = nms.weighted_nms(
        jnp.asarray(dets[:, :11]),
        jnp.asarray(dets[:, 11]),
        jnp.ones(n, bool),
        thresh=0.1,
        thresh_vote=0.5,
        max_keep=n,
    )
    out12 = np.asarray(out12)[np.asarray(out_valid)]
    assert out12.shape[0] == want.shape[0]
    np.testing.assert_allclose(out12, want, rtol=1e-3, atol=1e-3)


def test_wnms_respects_validity(rng):
    n = 16
    dets = _make_dets(rng, n)
    valid = np.zeros(n, bool)
    valid[:4] = True
    out12, out_valid = nms.weighted_nms(
        jnp.asarray(dets[:, :11]),
        jnp.asarray(dets[:, 11]),
        jnp.asarray(valid),
        thresh=0.1,
        thresh_vote=0.5,
        max_keep=8,
    )
    assert np.asarray(out_valid).sum() <= 4
    # survivors' scores must come from valid candidates
    surv_scores = np.asarray(out12)[np.asarray(out_valid), 11]
    assert np.isin(np.round(surv_scores, 5), np.round(dets[:4, 11], 5)).all()


def test_wnms_exact_duplicates_average(rng):
    """Identical boxes must suppress into one output equal to the input box."""
    dets = _make_dets(rng, 1)
    dets = np.repeat(dets, 5, axis=0)
    dets[:, 11] = [0.9, 0.8, 0.7, 0.6, 0.5]
    out12, out_valid = nms.weighted_nms(
        jnp.asarray(dets[:, :11]),
        jnp.asarray(dets[:, 11]),
        jnp.ones(5, bool),
        thresh=0.1,
        thresh_vote=0.5,
        max_keep=5,
    )
    ov = np.asarray(out_valid)
    assert ov.sum() == 1
    np.testing.assert_allclose(np.asarray(out12)[0, :11], dets[0, :11], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out12)[0, 11], 0.9, rtol=1e-5)


def test_nms3d_greedy(rng):
    n = 30
    csa = random_csa(rng, n, center_scale=5.0)
    corners = np.asarray(boxes.csa_to_corners_bev(jnp.asarray(csa))).reshape(n, 8)
    z0 = (csa[:, 2] - csa[:, 5] / 2)[:, None]
    z1 = (csa[:, 2] + csa[:, 5] / 2)[:, None]
    b10 = np.concatenate([corners, z0, z1], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    kept, keep_idx, valid = nms.nms_3d(
        jnp.asarray(b10), jnp.asarray(scores), jnp.ones(n, bool), 0.2, 10
    )
    kept, keep_idx, valid = map(np.asarray, (kept, keep_idx, valid))
    k = valid.sum()
    assert 0 < k <= 10
    # kept set must be mutually non-overlapping above threshold
    from rangedet_tpu.ops.rotated_iou import iou_bev_matrix

    kc = kept[:k, :8].reshape(-1, 4, 2)
    iou = np.array(iou_bev_matrix(jnp.asarray(kc), jnp.asarray(kc)))
    iou[np.arange(k), np.arange(k)] = 0
    assert (iou < 0.2 + 1e-5).all()
    # scores of kept are in descending order
    ks = scores[keep_idx[:k]]
    assert (np.diff(ks) <= 1e-6).all()


def test_wnms_3d_mode(rng):
    """Volumetric IoU mode: boxes overlapping in BEV but disjoint in z must
    not suppress each other."""
    dets = _make_dets(rng, 1)
    a = dets[0].copy()
    b = dets[0].copy()
    b[9] += b[10] + 1.0  # raise bottom above a's top: zero z-overlap
    b[11] = 0.5
    two = np.stack([a, b])
    out12, valid = nms.weighted_nms(
        jnp.asarray(two[:, :11]), jnp.asarray(two[:, 11]), jnp.ones(2, bool),
        thresh=0.1, thresh_vote=0.5, max_keep=2, iou_3d=True,
    )
    assert np.asarray(valid).sum() == 2  # both survive in 3D mode
    out12b, validb = nms.weighted_nms(
        jnp.asarray(two[:, :11]), jnp.asarray(two[:, 11]), jnp.ones(2, bool),
        thresh=0.1, thresh_vote=0.5, max_keep=2, iou_3d=False,
    )
    assert np.asarray(validb).sum() == 1  # BEV mode suppresses


def test_pre_nms_candidate_cap_equivalence(rng):
    """run_inference outputs are identical at a small device_topk and at the
    reference's full pre_nms_top_n whenever the number of above-min_score
    candidates fits in the small cap — and the per-frame ``truncated`` flag
    fires exactly when the cap binds (VERDICT item: get_sorted_foreground.py
    50k cap + test.py:200 min_score filter before WNMS)."""
    import jax
    from rangedet_tpu.models.detector import run_inference
    from tiny import tiny_config

    def fabricate(cfg, n_hot):
        """Per-level logits with exactly n_hot above-threshold pixels."""
        r = np.random.RandomState(0)
        logits, deltas, batch = [], [], {}
        hot_left = n_hot
        for s in cfg.fpn_strides:
            H, W = cfg.feat_size[0], cfg.feat_size[1] // s
            lg = r.uniform(-9.0, -5.0, (1, H, W, 1)).astype(np.float32)
            flat = lg.reshape(-1)
            take = min(hot_left, flat.size // 2)
            hot = r.choice(flat.size, take, replace=False)
            flat[hot] = r.uniform(2.0, 6.0, take)  # sigmoid > 0.88
            hot_left -= take
            logits.append(jnp.asarray(flat.reshape(1, H, W, 1)))
            deltas.append(jnp.asarray(
                r.uniform(-0.4, 0.4, (1, H, W, 8)).astype(np.float32)))
            pc = r.uniform(-30, 30, (1, H, W, 3)).astype(np.float32)
            batch[f"pc_s{s}"] = jnp.asarray(pc)
            batch[f"mask_s{s}"] = jnp.asarray(
                np.ones((1, H, W, 1), np.float32))
        return logits, deltas, batch

    base = tiny_config(is_train=False)

    # Case A: candidates fit in the small cap -> identical outputs
    cfg_small = base.replace(device_topk={"veh": 256},
                             pre_nms_top_n={"veh": 50000})
    cfg_full = base.replace(device_topk={"veh": 10 ** 9},
                            pre_nms_top_n={"veh": 50000})
    logits, deltas, batch = fabricate(base, n_hot=150)
    out_s = jax.jit(lambda l, d, b: run_inference(l, d, b, cfg_small))(
        logits, deltas, batch)
    out_f = jax.jit(lambda l, d, b: run_inference(l, d, b, cfg_full))(
        logits, deltas, batch)
    assert not bool(out_s["veh"]["truncated"][0])
    np.testing.assert_array_equal(np.asarray(out_s["veh"]["valid"]),
                                  np.asarray(out_f["veh"]["valid"]))
    np.testing.assert_allclose(np.asarray(out_s["veh"]["boxes"]),
                               np.asarray(out_f["veh"]["boxes"]), atol=1e-5)

    # Case B: more above-threshold candidates than the cap -> flagged
    logits, deltas, batch = fabricate(base, n_hot=700)
    out_t = jax.jit(lambda l, d, b: run_inference(l, d, b, cfg_small))(
        logits, deltas, batch)
    assert bool(out_t["veh"]["truncated"][0])
    # and the full-cap run is not truncated
    out_tf = jax.jit(lambda l, d, b: run_inference(l, d, b, cfg_full))(
        logits, deltas, batch)
    assert not bool(out_tf["veh"]["truncated"][0])


def test_wnms_prefilter_exact(rng):
    # The chunked circumcircle prefilter (nms.py:weighted_nms prefilter_topm,
    # the device analogue of nms.h:252-307 BBoxHash) must be output-identical
    # to the full-row path — including when the per-chunk bound binds and the
    # inner loop must sweep multiple chunks.
    n = 256
    dets = _make_dets(rng, n, scale=20.0)
    for k in range(0, 64, 4):  # clusters of near-duplicates (voting)
        dets[k + 1 : k + 4] = dets[k]
        dets[k + 1 : k + 4, :8] += rng.uniform(-0.2, 0.2, (3, 8))
        dets[k + 1 : k + 4, 11] = rng.uniform(0.05, 1.0, 3)

    args = (
        jnp.asarray(dets[:, :11]),
        jnp.asarray(dets[:, 11]),
        jnp.ones(n, bool),
    )
    kw = dict(thresh=0.1, thresh_vote=0.5, max_keep=64)
    exact, v_exact = nms.weighted_nms(*args, **kw, prefilter_topm=0)
    fast, v_fast = nms.weighted_nms(*args, **kw, prefilter_topm=64)
    np.testing.assert_array_equal(np.asarray(v_exact), np.asarray(v_fast))
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(fast), rtol=1e-6, atol=1e-6
    )

    # all boxes coincident -> every candidate collides with every
    # circumcircle, forcing n/topm = 16 chunks per round; output must STILL
    # equal the full-row path (the reference's BBoxHash is exact, nms.h:252)
    dense = np.tile(dets[:1], (n, 1))
    dense[:, 11] = rng.uniform(0.5, 1.0, n).astype(np.float32)
    dense_args = (
        jnp.asarray(dense[:, :11]),
        jnp.asarray(dense[:, 11]),
        jnp.ones(n, bool),
    )
    d_exact, dv_exact = nms.weighted_nms(*dense_args, **kw, prefilter_topm=0)
    d_fast, dv_fast = nms.weighted_nms(*dense_args, **kw, prefilter_topm=16)
    np.testing.assert_array_equal(np.asarray(dv_exact), np.asarray(dv_fast))
    np.testing.assert_allclose(
        np.asarray(d_exact), np.asarray(d_fast), rtol=1e-6, atol=1e-6
    )


def test_wnms_blocked_exact(rng):
    # The blocked greedy sweep (nms.py:weighted_nms block=...) must be
    # output-identical to the serial path: IoU rows are suppression-state
    # independent, so emitting still-alive block members in score order
    # replicates serial greedy exactly. Covers block sizes that divide /
    # straddle the survivor count, partial validity, voting clusters, a
    # max_keep that binds mid-block, and blocks larger than K.
    n = 256
    dets = _make_dets(rng, n, scale=20.0)
    for k in range(0, 64, 4):  # near-duplicate clusters (voting + median)
        dets[k + 1 : k + 4] = dets[k]
        dets[k + 1 : k + 4, :8] += rng.uniform(-0.2, 0.2, (3, 8))
        dets[k + 1 : k + 4, 11] = rng.uniform(0.05, 1.0, 3)
    valid = rng.uniform(size=n) > 0.2  # some invalid candidates

    args = (jnp.asarray(dets[:, :11]), jnp.asarray(dets[:, 11]),
            jnp.asarray(valid))
    for max_keep in (7, 64):  # 7 binds mid-block for every tested block
        kw = dict(thresh=0.1, thresh_vote=0.5, max_keep=max_keep)
        ref, v_ref = nms.weighted_nms(*args, **kw, prefilter_topm=0)
        for blk in (1, 4, 8, 19, 512):
            out, v = nms.weighted_nms(*args, **kw, block=blk)
            np.testing.assert_array_equal(
                np.asarray(v_ref), np.asarray(v), err_msg=f"block={blk}")
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(out), rtol=1e-6, atol=1e-6,
                err_msg=f"block={blk}")

    # 3D-IoU mode too (volumetric row formula shares the block path)
    kw3 = dict(thresh=0.1, thresh_vote=0.5, max_keep=32, iou_3d=True)
    ref3, v3 = nms.weighted_nms(*args, **kw3)
    out3, vb3 = nms.weighted_nms(*args, **kw3, block=8)
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(vb3))
    np.testing.assert_allclose(
        np.asarray(ref3), np.asarray(out3), rtol=1e-6, atol=1e-6)
