"""Sharding: engine ops and BN collectives over the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cagroup3d_tpu.parallel import make_mesh, batch_sharding


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_engine_pipeline_matches_single_device(rng):
    from cagroup3d_tpu.core import voxelize_points, subm_conv

    mesh = make_mesh()
    B, n = 8, 500

    pts = rng.rand(B, n, 3).astype(np.float32) * 2
    feats = rng.randn(B, n, 4).astype(np.float32)
    w = rng.randn(27, 4, 4).astype(np.float32) * 0.1

    def per_scene(p, f):
        st, _ = voxelize_points(p, f, jnp.ones(n, bool), 0.1, cap=1024)
        out = subm_conv(st, jnp.asarray(w), None, 3)
        return jnp.sum(out.feats ** 2)

    fn = jax.vmap(per_scene)
    ref = np.asarray(fn(jnp.asarray(pts), jnp.asarray(feats)))

    dp = batch_sharding(mesh)
    sp = jax.device_put(jnp.asarray(pts), dp)
    sf = jax.device_put(jnp.asarray(feats), dp)
    with mesh:
        got = np.asarray(jax.jit(fn, in_shardings=(dp, dp))(sp, sf))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_full_detector_dp_step_matches_single_device(rng):
    """One global batch, full CAGroup3D train step: the 8-device dp mesh
    must produce the same loss / tb dict / updated params as the same
    batch on one device.  This is the test that catches a wrong pmean
    normalizer — the reference syncs loss normalizers across ranks with
    reduce_mean (pcdet/models/model_utils/cagroup_utils.py:6-12, used at
    cagroup_head.py:523,530,538); here SyncBN + global jnp reductions
    over the sharded scene axis must be bitwise-equivalent semantics."""
    import optax
    from test_detector import tiny_cfg, synthetic_batch
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.parallel import make_mesh, make_train_step, \
        shard_batch

    cfg = tiny_cfg()
    model = build_network(cfg, num_class=4)
    params, state = model.init(jax.random.PRNGKey(0))
    # SGD(1.0): updated params = params - clipped grads, so the param
    # comparison IS a gradient comparison (adam's first-step m/sqrt(v)
    # amplifies float noise on near-zero grads to full 2*lr flips)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1.0))
    opt = tx.init(params)
    batch = synthetic_batch(rng, B=8, P=1200, G=8)
    key = jax.random.PRNGKey(7)

    step1 = make_train_step(model, tx, mesh=None, donate=False)
    p1, s1, o1, loss1, tb1 = step1(params, state, opt, batch, key,
                                   jnp.float32(3))

    mesh = make_mesh()
    step8 = make_train_step(model, tx, mesh=mesh, donate=False)
    with mesh:
        p8, s8, o8, loss8, tb8 = step8(params, state, opt,
                                       shard_batch(batch, mesh), key,
                                       jnp.float32(3))

    # tolerances: cross-device reduction reorder costs ~1e-4 relative
    # (measured); a wrong normalizer (per-shard instead of global mean)
    # would be off by O(n_devices) — orders of magnitude above this
    np.testing.assert_allclose(float(loss1), float(loss8),
                               rtol=5e-4, atol=1e-5)
    assert set(tb1) == set(tb8)
    for k in tb1:
        np.testing.assert_allclose(np.asarray(tb1[k]), np.asarray(tb8[k]),
                                   rtol=5e-3, atol=1e-4, err_msg=f"tb[{k}]")
    # Elementwise grad equality is NOT expected: the forward has discrete
    # threshold branches (semantic selection, assigner top-k, NMS keep
    # sets) that flip under SPMD float reorder and shift individual
    # gradient elements discontinuously (measured: up to ~7% of a param's
    # grad norm on the deepest backbone conv) while the loss stays equal
    # to 1e-4.  The scaling invariant that a wrong pmean normalizer
    # breaks — every grad element scaled by ~n_devices — is caught by
    # per-param GRAD NORM ratios (SGD(1.0): param delta == clipped grad).
    flat8 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(p8)}
    p0flat = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(params)}
    for kp, v1 in jax.tree_util.tree_leaves_with_path(p1):
        k = jax.tree_util.keystr(kp)
        g1 = np.linalg.norm(np.asarray(v1) - np.asarray(p0flat[k]))
        g8 = np.linalg.norm(np.asarray(flat8[k]) - np.asarray(p0flat[k]))
        if max(g1, g8) < 1e-5:    # untouched/zero-grad param
            continue
        ratio = g1 / max(g8, 1e-12)
        assert 0.85 <= ratio <= 1.18, \
            f"grad norm mismatch for {k}: 1-dev {g1:.4g} vs 8-dev {g8:.4g}"
    # BN running stats (state) must agree too — SyncBN over the mesh.
    # Head BN layers see selection-flip jitter (their inputs are the
    # thresholded class maps); per-SHARD stats would differ at O(1).
    s8flat = {jax.tree_util.keystr(q): w
              for q, w in jax.tree_util.tree_leaves_with_path(s8)}
    for kp, v1 in jax.tree_util.tree_leaves_with_path(s1):
        k = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(s8flat[k]),
                                   rtol=2e-2, atol=2e-3, err_msg=f"state {k}")


def test_sharded_eval_matches_unsharded_map(rng):
    """Eval path over the 8-device mesh: sharded forward + the
    merge_results_dist merge must reproduce the unsharded mAP exactly
    (reference tools/eval_utils/eval_utils.py:75-78 +
    pcdet/utils/common_utils.py:202-223)."""
    from test_detector import tiny_cfg, synthetic_batch
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.parallel import make_mesh, make_eval_step, \
        shard_batch
    from cagroup3d_tpu.datasets.indoor_eval import indoor_eval
    from cagroup3d_tpu.utils import commu_utils

    cfg = tiny_cfg()
    model = build_network(cfg, num_class=4)
    params, state = model.init(jax.random.PRNGKey(0))
    data = synthetic_batch(rng, B=8, P=1200, G=8)
    ebatch = {"points": data["points"], "points_valid": data["points_valid"]}

    def to_annos(preds):
        det = []
        for b in range(8):
            v = np.asarray(preds["pred_valid"][b])
            det.append(dict(
                boxes_3d=np.asarray(preds["pred_boxes"][b])[v][:, :7],
                scores_3d=np.asarray(preds["pred_scores"][b])[v],
                labels_3d=np.asarray(preds["pred_labels"][b])[v]))
        return det

    e1 = make_eval_step(model, mesh=None)
    ref_preds = e1(params, state, ebatch, jnp.float32(100))
    ref_preds.pop("overflow", None)

    mesh = make_mesh()
    e8 = make_eval_step(model, mesh=mesh)
    with mesh:
        got_preds = e8(params, state, shard_batch(ebatch, mesh),
                       jnp.float32(100))
    got_preds.pop("overflow", None)
    # single-process world: merge is the identity, but exercises the path
    det = commu_utils.merge_results_dist(to_annos(got_preds), total_size=8)

    gt_annos = []
    for i in range(8):
        gm = np.asarray(data["gt_valid"][i])
        gb = np.asarray(data["gt_boxes"][i])[gm]
        gt_annos.append(dict(gt_num=len(gb),
                             gt_boxes_upright_depth=gb[:, :7],
                             **{"class": gb[:, 7].astype(np.int64)}))
    label2cat = {i: f"c{i}" for i in range(4)}
    ref = indoor_eval(gt_annos, to_annos(ref_preds), [0.25, 0.5], label2cat)
    got = indoor_eval(gt_annos, det, [0.25, 0.5], label2cat)
    assert got["mAP_0.25"] == ref["mAP_0.25"]
    assert got["mAP_0.50"] == ref["mAP_0.50"]


def test_syncbn_psum_spans_sharded_batch(rng):
    """masked BN with axis_name under vmap over a sharded batch axis must
    produce identical stats on every shard (SyncBN)."""
    from cagroup3d_tpu.core.norm import masked_batch_norm

    mesh = make_mesh()
    B, n, c = 8, 64, 4
    x = rng.randn(B, n, c).astype(np.float32)
    mask = rng.rand(B, n) > 0.3

    def per_scene(xi, mi):
        y, (rm, rv) = masked_batch_norm(
            xi, mi, jnp.ones(c), jnp.zeros(c), jnp.zeros(c), jnp.ones(c),
            train=True, axis_name="scene")
        return y, rm, rv

    fn = jax.vmap(per_scene, axis_name="scene")
    dp = batch_sharding(mesh)
    with mesh:
        y, rm, rv = jax.jit(fn, in_shardings=(dp, dp))(
            jax.device_put(jnp.asarray(x), dp),
            jax.device_put(jnp.asarray(mask), dp))
    rm = np.asarray(rm)
    # stats identical across the batch axis (global reduction)
    np.testing.assert_allclose(rm, rm[0:1].repeat(B, 0), rtol=1e-5)
    # and equal to the global masked batch mean scaled by momentum
    gm = (np.asarray(x) * mask[..., None]).sum((0, 1)) / mask.sum()
    np.testing.assert_allclose(rm[0], 0.1 * gm, rtol=1e-4, atol=1e-5)
