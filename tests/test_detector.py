"""End-to-end CAGroup3D detector: tiny config, synthetic scenes,
train loss + grads + eval predictions."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network

TINY_CAPS = {1: 2048, 2: 1024, 4: 512, 8: 256, 16: 128, 32: 64,
             64: 32, 128: 16, 256: 8, 512: 8}


def tiny_cfg(n_classes=4, with_yaw=False):
    return EasyDict(dict(
        NAME="CAGroup3D",
        VOXEL_SIZE=0.02,
        SEMANTIC_MIN_THR=0.05,
        SEMANTIC_ITER_VALUE=0.02,
        SEMANTIC_THR=0.15,
        INPUT_CAP=2048,
        INS_CAP=16,
        BACKBONE_3D=dict(NAME="BiResNet", IN_CHANNELS=3, OUT_CHANNELS=16,
                         PLANES=16, SPP_PLANES=16, CAPS=TINY_CAPS),
        DENSE_HEAD=dict(
            NAME="CAGroup3DHead", OUT_CHANNELS=16,
            SEMANTIC_THR=0.15, VOXEL_SIZE=0.02,
            N_CLASSES=n_classes,
            N_REG_OUTS=8 if with_yaw else 6,
            CLS_KERNEL=3, WITH_YAW=with_yaw, USE_SEM_SCORE=False,
            EXPAND_RATIO=3,
            FINE_CAP=256, EXPAND_CAP=128, MAX_ROIS=32, NMS_PER_CLS_CAP=32,
            ASSIGNER=dict(NAME="CAGroup3DAssigner", LIMIT=27, TOPK=18,
                          N_SCALES=4),
            LOSS_OFFSET=dict(NAME="SmoothL1Loss", BETA=0.04, REDUCTION="sum",
                             LOSS_WEIGHT=1.0),
            NMS_CONFIG=dict(SCORE_THR=0.01, NMS_PRE=128, IOU_THR=0.5),
        ),
        ROI_HEAD=dict(
            NAME="CAGroup3DRoIHead", NUM_CLASSES=n_classes,
            MIDDLE_FEATURE_SOURCE=[3], GRID_SIZE=7, VOXEL_SIZE=0.02,
            COORD_KEY=2, MLPS=[[16, 32, 32]],
            CODE_SIZE=7 if with_yaw else 6,
            ENCODE_SINCOS=with_yaw,
            ROI_PER_IMAGE=16, ROI_FG_RATIO=0.9, REG_FG_THRESH=0.3,
            ROI_CONV_KERNEL=3, ENLARGE_RATIO=False,
            USE_IOU_LOSS=with_yaw, GRID_CAP=1024, MAX_OUT=32,
            NMS_PER_CLS_CAP=32, REG_FC=[32, 32],
            LOSS_WEIGHTS=dict(RCNN_CLS_WEIGHT=1.0, RCNN_REG_WEIGHT=1.0,
                              RCNN_IOU_WEIGHT=1.0,
                              CODE_WEIGHT=[1.0] * (8 if with_yaw else 6)),
        ),
        POST_PROCESSING=dict(RECALL_THRESH_LIST=[0.25, 0.5],
                             EVAL_METRIC="scannet"),
    ))


def synthetic_batch(rng, B=2, P=1200, G=8, n_classes=4, yaw=False):
    pts = np.zeros((B, P, 6), np.float32)
    pvalid = np.zeros((B, P), bool)
    gt = np.zeros((B, G, 8), np.float32)
    gt_valid = np.zeros((B, G), bool)
    sem = np.full((B, P), n_classes, np.int32)
    ins = np.zeros((B, P), np.int32)
    for b in range(B):
        n = P - 100 * b
        # a few box-shaped clusters + clutter
        n_obj = 3
        centers = rng.rand(n_obj, 3) * 2 + 0.5
        sizes = rng.rand(n_obj, 3) * 0.5 + 0.3
        angles = (rng.rand(n_obj) - 0.5) * np.pi if yaw \
            else np.zeros(n_obj)
        per = n // (n_obj + 1)
        for i in range(n_obj):
            lo = i * per
            local = (rng.rand(per, 3) - 0.5) * sizes[i]
            if yaw:   # rotate the box-shaped cluster about z by its yaw
                c, s = np.cos(angles[i]), np.sin(angles[i])
                local = local @ np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]],
                                         np.float32).T
            pts[b, lo:lo + per, :3] = centers[i] + local
            sem[b, lo:lo + per] = i % n_classes
            ins[b, lo:lo + per] = i + 1
            gt[b, i, :3] = centers[i]
            gt[b, i, 3:6] = sizes[i]
            gt[b, i, 6] = angles[i]
            gt[b, i, 7] = i % n_classes
            gt_valid[b, i] = True
        pts[b, n_obj * per:n, :3] = rng.rand(n - n_obj * per, 3) * 3
        pts[b, :n, 3:6] = rng.rand(n, 3) * 255
        pvalid[b, :n] = True
    return dict(points=jnp.asarray(pts), points_valid=jnp.asarray(pvalid),
                gt_boxes=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid),
                semantic_mask=jnp.asarray(sem),
                instance_mask=jnp.asarray(ins))


@pytest.mark.parametrize("with_yaw", [False, True])
def test_train_forward_loss_grads(rng, with_yaw):
    cfg = tiny_cfg(with_yaw=with_yaw)
    model = build_network(cfg, num_class=4)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1),
                                            cur_epoch=0)
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    for k, v in tb.items():
        assert np.isfinite(float(v)), (k, v)
    # state updates exist and have no leading batch axis
    for k, v in upd.items():
        assert v.shape == S[k].shape, k
    # gradient flows to backbone, head and roi head
    for key in ["backbone_3d.conv1.0.kernel",
                "dense_head.cls_individual_out.0.kernel",
                "roi_head.reg_pred_layer.weight"]:
        assert np.isfinite(np.asarray(grads[key])).all(), key
    assert float(jnp.abs(grads["backbone_3d.conv1.0.kernel"]).sum()) > 0


def test_open_semantic_gate_produces_positives(rng):
    """With the semantic gate forced open, grouped points must cover the
    GT boxes and the assigner must yield positive targets (nonzero
    centerness/bbox losses)."""
    cfg = tiny_cfg()
    # the open gate selects every voxel for every class: the fine maps
    # need capacity for 2x all stride-2 voxels (overflow drops a spatial
    # slab deterministically, which would hide the GT)
    cfg.DENSE_HEAD.FINE_CAP = 2048
    cfg.DENSE_HEAD.EXPAND_CAP = 1024
    model = build_network(cfg, num_class=4)
    P, S = model.init(jax.random.PRNGKey(0))
    # force every voxel through the per-class selection
    P["dense_head.semantic_conv.bias"] = \
        P["dense_head.semantic_conv.bias"] * 0 + 5.0
    batch = synthetic_batch(rng, B=1)
    loss, tb, _ = jax.jit(lambda p, b: model.forward_train(
        p, S, b, jax.random.PRNGKey(1), cur_epoch=0))(P, batch)
    assert np.isfinite(float(loss))
    assert float(tb["loss_centerness"]) > 0, tb
    assert float(tb["loss_bbox"]) > 0, tb
    assert float(tb["loss_cls"]) > 0, tb


def test_eval_batch1_matches_vmapped_path(rng):
    """forward_eval's no-vmap batch-1 fast path must equal the vmapped
    path (duplicate the scene into a batch of 2 and compare)."""
    cfg = tiny_cfg()
    model = build_network(cfg, num_class=4)
    P, S = model.init(jax.random.PRNGKey(0))
    # open the gate a bit so predictions are non-trivial
    P["dense_head.cls_conv.bias"] = P["dense_head.cls_conv.bias"] * 0 + 1.0
    b1 = synthetic_batch(rng, B=1)
    b2 = {k: np.repeat(np.asarray(v), 2, axis=0) for k, v in b1.items()}
    b2 = {k: jnp.asarray(v) for k, v in b2.items()}
    fe = jax.jit(lambda p, b: model.forward_eval(p, S, b, cur_epoch=10))
    out1 = fe(P, b1)
    out2 = fe(P, b2)
    np.testing.assert_allclose(np.asarray(out1["pred_boxes"][0]),
                               np.asarray(out2["pred_boxes"][0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out1["pred_valid"][0]),
                                  np.asarray(out2["pred_valid"][0]))
    np.testing.assert_allclose(np.asarray(out1["pred_scores"][0]),
                               np.asarray(out2["pred_scores"][0]),
                               rtol=1e-3, atol=1e-3)


def test_eval_forward(rng):
    cfg = tiny_cfg()
    model = build_network(cfg, num_class=4)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(rng)
    preds = jax.jit(lambda p, b: model.forward_eval(
        p, S, b, cur_epoch=10))(P, batch)
    assert preds["pred_boxes"].shape == (2, 32, 7)
    assert np.isfinite(np.asarray(preds["pred_boxes"])).all()
    v = np.asarray(preds["pred_valid"])
    s = np.asarray(preds["pred_scores"])
    assert (s[~v] == 0).all()
