"""PointNet2 SA/FP modules, FBS backbone, and VoteModule."""
import numpy as np
import jax
import jax.numpy as jnp

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.core.module import Ctx
from cagroup3d_tpu.models.backbones_3d.pointnet2_fbs_backbone import \
    PointNet2FBSBackbone
from cagroup3d_tpu.models.backbones_3d.pointnet2_modules import (FPModule,
                                                                 SAModule)
from cagroup3d_tpu.models.model_utils.vote_module import (VoteModule,
                                                          chamfer_distance)


def test_sa_fp_roundtrip(rng):
    N, C = 256, 8
    xyz = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    valid = jnp.ones(N, bool)
    sa = SAModule(64, 0.3, 16, [C, 16, 32])
    P, S = sa.init(jax.random.PRNGKey(0), "sa")
    ctx = Ctx(train=False)
    nx, nf, nv, idx = sa(P, S, ctx, "sa", xyz, feats, valid)
    assert nx.shape == (64, 3) and nf.shape == (64, 32)
    assert np.isfinite(np.asarray(nf)).all()

    fp = FPModule([32 + C, 16])
    P2, S2 = fp.init(jax.random.PRNGKey(1), "fp")
    out = fp(P2, S2, ctx, "fp", xyz, feats, valid, nx, nf, nv)
    assert out.shape == (N, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_fbs_backbone_forward(rng):
    cfg = EasyDict(dict(
        IN_CHANNELS=3,
        SA_CONFIG=dict(NPOINTS=[128, 64, 32, 16],
                       RADIUS=[0.2, 0.4, 0.8, 1.2],
                       NSAMPLE=[16, 16, 8, 8],
                       MLPS=[[16, 16], [32, 32], [32, 32], [32, 32]],
                       FBS_MLPS=[[-1, -1], [16, 16], [16, 16], [16, 16]],
                       TOPK=[-1, 48, 24, 12],
                       FG_NSAMPLE=[-1, 48, 24, 12]),
        FP_MLPS=[[32], [32]],
    ))
    net = PointNet2FBSBackbone(cfg)
    P, S = net.init(jax.random.PRNGKey(0))
    N = 512
    xyz = jnp.asarray(rng.rand(N, 3).astype(np.float32) * 4)
    feats = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    valid = jnp.asarray(np.arange(N) < 400)
    out = net(P, S, Ctx(train=False), xyz, feats, valid)
    # fp output lands on the second SA level (npoints 64)
    assert out["fp_xyz"].shape == (64, 3)
    assert out["fp_features"].shape == (64, 32)
    # levels 1..3 use foreground-biased sampling (level 0 is plain FPS)
    assert len(out["sa_scores"]) == 3
    for sc, sidx in out["sa_scores"]:
        assert sc.shape[-1] == 2 and sidx.shape[0] == sc.shape[0]
    assert np.isfinite(np.asarray(out["fp_features"])).all()
    # grads flow to the fbs scoring mlp and SA mlps
    def loss(P):
        o = net(P, S, Ctx(train=True), xyz, feats, valid)
        return jnp.sum(o["fp_features"] ** 2)
    g = jax.grad(loss)(P)
    assert float(jnp.abs(g["backbone_3d.SA_modules.0.mlps.0.0.conv.weight"])
                 .sum()) > 0


def test_vote_module(rng):
    cfg = dict(IN_CHANNELS=8, VOTE_PER_SEED=1, GT_PER_SEED=3,
               CONV_CHANNELS=(8, 8), NORM_FEATS=True, WITH_RES_FEAT=True,
               VOTE_LOSS=dict(NAME="ChamferDistance", MODE="l2",
                              LOSS_DST_WEIGHT=10.0))
    vm = VoteModule(cfg)
    P, S = vm.init(jax.random.PRNGKey(0))
    N = 64
    xyz = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    valid = jnp.ones(N, bool)
    vx, vf, off, vv = vm(P, S, Ctx(train=False), xyz, feats, valid)
    assert vx.shape == (N, 3) and vf.shape == (N, 8)
    # normed features have unit norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vf), axis=1), 1.0,
                               rtol=1e-4)
    tgt = jnp.asarray(rng.rand(N, 9).astype(np.float32) * 0.1)
    l = vm.get_loss(xyz, vx, valid, jnp.ones(N, bool), tgt)
    assert np.isfinite(float(l)) and float(l) > 0


def test_chamfer_distance(rng):
    a = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    ls, ld, _, _ = chamfer_distance(a, jnp.ones(10, bool), a,
                                    jnp.ones(10, bool))
    np.testing.assert_allclose(np.asarray(ls), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)
