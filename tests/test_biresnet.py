"""BiResNet backbone: shape/compile/grad sanity on small synthetic scenes."""
import numpy as np
import jax
import jax.numpy as jnp

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.core import voxelize_points
from cagroup3d_tpu.core.module import Ctx
from cagroup3d_tpu.models.backbones_3d import BiResNet

SMALL_CAPS = {1: 2048, 2: 1024, 4: 512, 8: 256, 16: 128, 32: 64,
              64: 32, 128: 16, 256: 8, 512: 8}


def make_backbone(planes=16):
    cfg = EasyDict(dict(IN_CHANNELS=3, OUT_CHANNELS=16, PLANES=planes,
                        SPP_PLANES=16, CAPS=SMALL_CAPS))
    return BiResNet(cfg)


def synthetic_scene(rng, n=1500):
    pts = rng.rand(n, 3).astype(np.float32) * np.array([3.0, 3.0, 2.0])
    rgb = rng.rand(n, 3).astype(np.float32)
    st, _ = voxelize_points(jnp.asarray(pts), jnp.asarray(rgb),
                            jnp.ones(n, bool), 0.1, cap=SMALL_CAPS[1],
                            mode="first")
    return st


def test_forward_shapes(rng):
    net = make_backbone()
    P, S = net.init(jax.random.PRNGKey(0))
    st = synthetic_scene(rng)
    ctx = Ctx(train=False)
    out = net(P, S, ctx, st)
    assert out.stride == 2
    assert out.feats.shape == (SMALL_CAPS[2], 16)
    assert int(out.num_valid()) > 0
    f = np.asarray(out.feats)
    assert np.isfinite(f).all()
    # output is post-BN-ReLU: non-negative
    assert (f >= 0).all()
    # invalid rows zero
    v = np.asarray(out.valid)
    assert (f[~v] == 0).all()


def test_train_mode_updates_bn_and_grads(rng):
    net = make_backbone()
    P, S = net.init(jax.random.PRNGKey(0))
    st = synthetic_scene(rng, n=800)

    def loss_fn(P):
        ctx = Ctx(train=True)
        out = net(P, S, ctx, st)
        return jnp.sum(out.feats ** 2), ctx.updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(P)
    assert np.isfinite(float(loss))
    assert len(updates) == sum(1 for k in S if k.endswith("running_mean")) * 2
    # every conv kernel got a gradient signal somewhere
    gnorm = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert gnorm > 0
    # stem conv specifically receives gradient
    assert float(jnp.abs(grads["backbone_3d.conv1.0.kernel"]).sum()) > 0


def test_jit_compiles(rng):
    net = make_backbone()
    P, S = net.init(jax.random.PRNGKey(0))
    st = synthetic_scene(rng, n=500)

    @jax.jit
    def fwd(P, S, coords, feats, valid):
        from cagroup3d_tpu.core.sparse import SparseTensor
        st = SparseTensor(coords, feats, valid, 1)
        out = net(P, S, Ctx(train=False), st)
        return out.feats

    f1 = fwd(P, S, st.coords, st.feats, st.valid)
    f2 = net(P, S, Ctx(train=False), st).feats
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=2e-2,
                               atol=2e-2)


def test_up_single_parent_matches_general(rng):
    """Eval single-parent fast path == general transposed-conv path
    (layers._up_single_parent vs neighbor_table + gather_gemm), solo and
    under the per-scene vmap (scene_fold)."""
    from cagroup3d_tpu.core.kernel_maps import (neighbor_table,
                                                transpose_offsets)
    from cagroup3d_tpu.core.sparse import SparseTensor
    from cagroup3d_tpu.core.sparse_conv import gather_gemm
    from cagroup3d_tpu.core.voxelize import stride_reduce_coords
    from cagroup3d_tpu.models import layers as L

    C = 16
    k, up_factor = 2, 2

    def scene(seed):
        r = np.random.RandomState(seed)
        st2 = synthetic_scene(r, 1200)          # stride-1 table
        st2 = SparseTensor(st2.coords * 2, st2.feats, st2.valid, 2)
        st4, _ = stride_reduce_coords(st2, 2, SMALL_CAPS[2])
        f4 = jnp.asarray(
            r.randn(st4.cap, C).astype(np.float32)) * st4.valid[:, None]
        src = SparseTensor(st4.coords, f4, st4.valid, 4)
        return src, st2.coords, st2.valid

    r0 = np.random.RandomState(0)
    w = jnp.asarray(r0.randn(k ** 3, C, C).astype(np.float32) * 0.1)
    b = jnp.asarray(r0.randn(C).astype(np.float32) * 0.1)
    P = {"up.kernel": w, "up.bias": b}

    def oracle(src, tgt_c, tgt_v):
        offs = transpose_offsets(k, src.stride // up_factor)
        nbr = neighbor_table(src, tgt_c, tgt_v, offs)
        f = gather_gemm(src.feats, nbr, w, b)
        return jnp.where(tgt_v[:, None], f, 0.0)

    # solo (no fold)
    src, tc, tv = scene(1)
    ctx = Ctx(train=False, axis_name=None, rng=jax.random.PRNGKey(0))
    got = L.up(P, ctx, "up", src, tc, tv, k, up_factor)
    np.testing.assert_allclose(np.asarray(got.feats),
                               np.asarray(oracle(src, tc, tv)),
                               rtol=2e-2, atol=2e-2)
    assert got.stride == 2

    # under the per-scene vmap (scene_fold path)
    scenes = [scene(2), scene(3)]
    sc = jnp.stack([s[0].coords for s in scenes])
    sf = jnp.stack([s[0].feats for s in scenes])
    sv = jnp.stack([s[0].valid for s in scenes])
    tc2 = jnp.stack([s[1] for s in scenes])
    tv2 = jnp.stack([s[2] for s in scenes])

    def one(scc, sff, svv, tcc, tvv):
        ctx = Ctx(train=False, axis_name="scene",
                  rng=jax.random.PRNGKey(0))
        src = SparseTensor(scc, sff, svv, 4)
        return L.up(P, ctx, "up", src, tcc, tvv, k, up_factor).feats

    outs = jax.vmap(one)(sc, sf, sv, tc2, tv2)
    for i, (src, tcc, tvv) in enumerate(scenes):
        np.testing.assert_allclose(np.asarray(outs[i]),
                                   np.asarray(oracle(src, tcc, tvv)),
                                   rtol=2e-2, atol=2e-2)
