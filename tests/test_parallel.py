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
