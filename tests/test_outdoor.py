"""SECOND / PointPillar outdoor stack: tiny configs, synthetic LiDAR-ish
scenes, train loss + grads + eval (reference pcdet/models/detectors/
second_net.py, pointpillar.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


def second_cfg():
    return EasyDict(dict(
        NAME="SECONDNet",
        POINT_CLOUD_RANGE=PC_RANGE,
        VOXEL_SIZE=[0.25, 0.25, 0.1],         # grid 64 x 64 x 41
        INPUT_CAP=4096,
        VFE=dict(NAME="MeanVFE", NUM_POINT_FEATURES=4),
        BACKBONE_3D=dict(NAME="VoxelBackBone8x", IN_CHANNELS=4,
                         CAPS={1: 4096, 2: 2048, 4: 1024, 8: 512}),
        MAP_TO_BEV=dict(NAME="HeightCompression", NUM_BEV_FEATURES=256),
        BACKBONE_2D=dict(NAME="BaseBEVBackbone", IN_CHANNELS=256,
                         LAYER_NUMS=[2, 2], LAYER_STRIDES=[1, 2],
                         NUM_FILTERS=[32, 64], UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[32, 32]),
        DENSE_HEAD=dict(
            NAME="AnchorHeadSingle", CLASS_AGNOSTIC=False,
            IN_CHANNELS=64,
            USE_DIRECTION_CLASSIFIER=True, DIR_OFFSET=0.78539,
            DIR_LIMIT_OFFSET=0.0, NUM_DIR_BINS=2,
            ANCHOR_GENERATOR_CONFIG=[
                dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-1.78],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.6, unmatched_threshold=0.45),
                dict(class_name="Pedestrian",
                     anchor_sizes=[[0.8, 0.6, 1.73]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-0.6],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.5, unmatched_threshold=0.35),
            ],
            LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                cls_weight=1.0, loc_weight=2.0, dir_weight=0.2,
                code_weights=[1.0] * 7)),
            NMS_CONFIG=dict(SCORE_THRESH=0.1, NMS_THRESH=0.01,
                            NMS_PRE_MAXSIZE=512),
            MAX_OUT=64,
        ),
        POST_PROCESSING=dict(RECALL_THRESH_LIST=[0.3, 0.5, 0.7]),
    ))


def pillar_cfg():
    c = second_cfg()
    c.NAME = "PointPillar"
    c.VOXEL_SIZE = [0.25, 0.25, 4.0]
    c.VFE = EasyDict(dict(NAME="PillarVFE", NUM_POINT_FEATURES=4,
                          WITH_DISTANCE=False, USE_ABSOLUTE_XYZ=True,
                          NUM_FILTERS=[32]))
    c.pop("BACKBONE_3D")
    c.MAP_TO_BEV = EasyDict(dict(NAME="PointPillarScatter",
                                 NUM_BEV_FEATURES=32))
    c.BACKBONE_2D.IN_CHANNELS = 32
    for a in c.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG:
        a["feature_map_stride"] = 1
    c.DENSE_HEAD.NMS_CONFIG.NMS_PRE_MAXSIZE = 512
    return c


def outdoor_batch(rng, B=2, P=2000, G=6):
    pts = np.zeros((B, P, 4), np.float32)
    pvalid = np.zeros((B, P), bool)
    gt = np.zeros((B, G, 8), np.float32)
    gt_valid = np.zeros((B, G), bool)
    for b in range(B):
        n = P - 100 * b
        n_obj = 3
        ctr = np.stack([rng.rand(n_obj) * 12 + 2, rng.rand(n_obj) * 12 - 6,
                        rng.rand(n_obj) * 0.5 - 1.5], -1)
        size = np.stack([rng.rand(n_obj) * 2 + 2, rng.rand(n_obj) + 1,
                         rng.rand(n_obj) + 1], -1)
        yaw = rng.rand(n_obj) * np.pi - np.pi / 2
        per = n // (n_obj + 1)
        for i in range(n_obj):
            lo = i * per
            u = (rng.rand(per, 3) - 0.5) * 0.9 * size[i]
            c, s = np.cos(yaw[i]), np.sin(yaw[i])
            x = u[:, 0] * c - u[:, 1] * s
            y = u[:, 0] * s + u[:, 1] * c
            pts[b, lo:lo + per, :3] = ctr[i] + np.stack([x, y, u[:, 2]], -1)
            gt[b, i, :3] = ctr[i]
            gt[b, i, 3:6] = size[i]
            gt[b, i, 6] = yaw[i]
            gt[b, i, 7] = i % 2
            gt_valid[b, i] = True
        pts[b, n_obj * per:n, 0] = rng.rand(n - n_obj * per) * 15
        pts[b, n_obj * per:n, 1] = rng.rand(n - n_obj * per) * 14 - 7
        pts[b, n_obj * per:n, 2] = -1.7
        pts[b, :n, 3] = rng.rand(n)
        pvalid[b, :n] = True
    return dict(points=jnp.asarray(pts), points_valid=jnp.asarray(pvalid),
                gt_boxes=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid))


@pytest.mark.parametrize("cfg_fn", [second_cfg, pillar_cfg])
def test_outdoor_train_loss_grads(rng, cfg_fn):
    cfg = cfg_fn()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = outdoor_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    for k, v in tb.items():
        assert np.isfinite(float(v)), (k, v)
    for k, v in upd.items():
        assert v.shape == S[k].shape, k
    key = "dense_head.conv_box.weight"
    assert float(jnp.abs(grads[key]).sum()) > 0
    # positives must exist (anchors cover the GT)
    assert float(tb["rpn_loss_loc"]) > 0


def test_outdoor_eval(rng):
    cfg = second_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = outdoor_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 64, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_anchor_layout_is_location_major():
    """Flat anchor row i must match prediction row i of the
    [y][x][per-loc anchor] reshape (pcdet cats class grids on dim=-3,
    anchor_head_template.py:42; round-2 advisor finding: class-major
    concatenation mismatched every multi-class anchor)."""
    from cagroup3d_tpu.models.dense_heads.anchor_head import \
        AnchorHeadSingle
    cfg = second_cfg().DENSE_HEAD
    head = AnchorHeadSingle(cfg, num_class=2,
                            grid_size=[64, 64, 41],
                            point_cloud_range=PC_RANGE)
    A_loc = head.n_anchors_per_loc
    assert A_loc == 4  # 2 classes x 1 size x 2 rots
    a = head.anchors_np.reshape(-1, A_loc, 7)
    # every per-location block shares one (x, y) center
    assert np.allclose(a[:, :, 0], a[:, :1, 0])
    assert np.allclose(a[:, :, 1], a[:, :1, 1])
    # within a block: class 0 (Car) anchors first, then class 1
    assert np.allclose(a[:, 0, 3:6], [3.9, 1.6, 1.56])
    assert np.allclose(a[:, 1, 3:6], [3.9, 1.6, 1.56])
    assert np.allclose(a[:, 2, 3:6], [0.8, 0.6, 1.73])
    assert np.allclose(a[:, 3, 3:6], [0.8, 0.6, 1.73])
    assert np.allclose(a[:, 0, 6], 0.0) and np.allclose(a[:, 1, 6], 1.57)
    # class ids / thresholds tile the same per-location pattern
    assert (head.anchor_cls_np.reshape(-1, A_loc) ==
            np.asarray([0, 0, 1, 1])).all()
    assert np.allclose(head.matched_thr_np.reshape(-1, A_loc),
                       [0.6, 0.6, 0.5, 0.5])
    # x varies fastest across location blocks (row-major [y][x])
    ny = nx = 64 // 8
    grid = head.anchors_np.reshape(ny, nx, A_loc, 7)
    assert np.allclose(grid[:, :, :, 0], grid[:1, :, :, 0])  # x: col only
    assert np.allclose(grid[:, :, :, 1], grid[:, :1, :, 1])  # y: row only


def test_spconv_final_grid_z_plus_one():
    """spconv sparse_shape adds 1 to z (spconv_backbone.py:75); KITTI
    gz=40 must give final D=2 so HeightCompression's 2*128=256 holds
    (round-2 advisor finding: gz=40 yielded D=1)."""
    cfg = second_cfg()
    cfg.POINT_CLOUD_RANGE = [0.0, -40.0, -3.0, 70.4, 40.0, 1.0]
    cfg.VOXEL_SIZE = [0.05, 0.05, 0.1]       # KITTI: 1408 x 1600 x 40
    model = build_network(cfg, num_class=2)
    assert model.grid_size == [1408, 1600, 40]
    assert model._final_grid() == (176, 200, 2)


def test_spconv_reduce_lat_edge_clamp():
    """With in_extent given, outputs past the dense output extent are
    suppressed: input i=X-1 (k=3, s=2, p=1) would otherwise emit
    o=(X+p)//2 == out extent, a voxel spconv never creates."""
    from cagroup3d_tpu.core.voxelize import spconv_reduce_lat
    X = 8                               # out extent (8+2-3)//2+1 = 4
    lat = jnp.asarray([[7, 0, 0]], jnp.int32)
    valid = jnp.asarray([True])
    out_lat, out_valid = spconv_reduce_lat(
        lat, valid, 3, 2, 1, 8, in_extent=(X, X, X))
    got = np.asarray(out_lat)[np.asarray(out_valid)]
    assert (got[:, 0] < 4).all(), got
    assert len(got) == 1 and got[0, 0] == 3    # only o=3 survives
    # without in_extent the spurious o=4 appears (documents the default)
    out_lat2, out_valid2 = spconv_reduce_lat(lat, valid, 3, 2, 1, 8)
    got2 = np.asarray(out_lat2)[np.asarray(out_valid2)]
    assert set(got2[:, 0].tolist()) == {3, 4}


def test_spconv_reduce_lat_matches_dense_reference():
    """Sparse output lattice == dense-conv occupancy for random sparse
    inputs across (k, s, p) combos.  Catches both the alignment
    undercount (an isolated input at i=7, k3 s2 p1 must ALSO emit o=4)
    and over-generation."""
    from cagroup3d_tpu.core.voxelize import spconv_reduce_lat
    rs = np.random.RandomState(3)
    X = 9
    for k, s, p in [(3, 2, 1), (3, 2, 0), (2, 2, 0), (3, 1, 1),
                    ((1, 1, 3), (1, 1, 2), 0)]:
        kk = np.broadcast_to(np.asarray(k), (3,)).astype(int)
        ss = np.broadcast_to(np.asarray(s), (3,)).astype(int)
        pp = np.broadcast_to(np.asarray(p), (3,)).astype(int)
        oe = (np.asarray([X] * 3) + 2 * pp - kk) // ss + 1
        for _ in range(5):
            n = rs.randint(1, 20)
            lat = rs.randint(0, X, (n, 3)).astype(np.int32)
            # dense reference: every in-extent o whose receptive field
            # o*s-p + [0, k) contains an input
            expect = set()
            for o in np.ndindex(*oe):
                lo = np.asarray(o) * ss - pp
                if ((lat >= lo) & (lat < lo + kk)).all(1).any():
                    expect.add(tuple(o))
            out_lat, out_valid = spconv_reduce_lat(
                jnp.asarray(lat), jnp.ones(n, bool), k, s, p, 512,
                in_extent=(X, X, X))
            got = {tuple(r) for r in
                   np.asarray(out_lat)[np.asarray(out_valid)]}
            assert got == expect, (k, s, p, got ^ expect)


def test_vfe_max_points_per_voxel_matches_spconv_oracle():
    """spconv's voxelizer keeps only the FIRST max_points points per
    voxel of the shuffled array (reference data_processor.py
    transform_points_to_voxels); MeanVFE must average that capped set,
    not every point.  Oracle: python dict fill in arrival order."""
    from cagroup3d_tpu.core.module import Ctx
    from cagroup3d_tpu.models.backbones_3d.vfe import MeanVFE, PillarVFE

    rs = np.random.RandomState(7)
    P, MP, CAP = 500, 5, 512
    pts = np.concatenate([rs.uniform(0, 4, (P, 3)),
                          rs.randn(P, 1)], 1).astype(np.float32)
    pvalid = rs.rand(P) > 0.1
    vs, rng0 = [0.5, 0.5, 0.5], [0.0, 0.0, 0.0]

    # oracle
    fill = {}
    for i in range(P):
        if not pvalid[i]:
            continue
        key = tuple((pts[i, :3] // 0.5).astype(int))
        fill.setdefault(key, [])
        if len(fill[key]) < MP:
            fill[key].append(pts[i])
    expect = {k: np.mean(v, 0) for k, v in fill.items()}

    vfe = MeanVFE(EasyDict({}), num_point_features=4,
                  max_points_per_voxel=MP)
    ctx = Ctx(train=False)
    st = vfe({}, {}, ctx, jnp.asarray(pts), jnp.asarray(pvalid), vs,
             rng0 + [4.0, 4.0, 4.0], CAP)
    coords = np.asarray(st.coords)[np.asarray(st.valid)]
    feats = np.asarray(st.feats)[np.asarray(st.valid)]
    assert len(coords) == len(expect)
    for c, f in zip(coords, feats):
        np.testing.assert_allclose(f, expect[tuple(c)], rtol=2e-4,
                                   atol=2e-4)

    # PillarVFE: points past the cap must not influence the pooled max
    pcfg = EasyDict(dict(NUM_FILTERS=[8]))
    pv = PillarVFE(pcfg, num_point_features=4, max_points_per_voxel=1)
    Pp, Sp = pv.init(jax.random.PRNGKey(0))
    pts2 = pts.copy()
    # every point after the first in each pillar gets a huge feature
    seen = set()
    first = np.zeros(P, bool)
    for i in range(P):
        key = tuple((pts2[i, :2] // 0.5).astype(int))
        if key not in seen and pvalid[i]:
            seen.add(key)
            first[i] = True
    pts3 = pts2.copy()
    pts3[~first, 3] = 1e4
    out2 = pv(Pp, Sp, Ctx(train=False), jnp.asarray(pts2),
              jnp.asarray(pvalid), [0.5, 0.5, 4.1],
              rng0 + [4.0, 4.0, 4.0], CAP)
    out3 = pv(Pp, Sp, Ctx(train=False), jnp.asarray(pts3),
              jnp.asarray(pvalid), [0.5, 0.5, 4.1],
              rng0 + [4.0, 4.0, 4.0], CAP)
    np.testing.assert_allclose(np.asarray(out2.feats),
                               np.asarray(out3.feats), rtol=1e-4,
                               atol=1e-4)
