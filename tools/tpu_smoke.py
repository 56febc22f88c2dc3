"""On-TPU kernel smoke gate: compile + exactness of the MXU Pallas conv
kernels against the XLA engine paths ON REAL HARDWARE.

Why this exists: interpret-mode tests (tests/test_pallas_conv.py) cannot
catch Mosaic lowering failures or miscompiles that only appear on the
chip (round-3 lesson: an untested i16 narrow passed interpret mode but
failed Mosaic with "Target does not support this comparison"; the QW=256
one-hot variant MISCOMPILED silently with ~7% rel err).  Rule: no change
to ops/pallas_conv.py lands without this passing on the TPU.

Runs in ~1-2 min (small tables, everything jitted, single host fetch per
check).  Exit code 0 = all kernels compile and match the XLA reference
within tolerance; prints one JSON line per check and a final PASS/FAIL.

Usage:  python tools/tpu_smoke.py          # on the axon TPU
        JAX_PLATFORMS=cpu python tools/tpu_smoke.py   # interpret fallback
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    from cagroup3d_tpu.core.voxelize import unique_voxels_classes, \
        unique_voxels
    from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped_classes, \
        scan_conv_grouped
    from cagroup3d_tpu.ops.pallas_conv import subm_conv_classes_mxu, \
        conv_at_coords_mxu

    backend = jax.default_backend()
    checks = []
    failed = False

    def check(name, err, tol):
        nonlocal failed
        ok = err < tol
        failed |= not ok
        line = {"check": name, "rel_err": round(err, 6), "tol": tol,
                "ok": ok, "backend": backend}
        checks.append(line)
        print(json.dumps(line))

    rs = np.random.RandomState(0)
    G, P, C, CAP = 4, 2000, 64, 1024
    lat = rs.randint(0, 20, (G, P, 3)).astype(np.int32)
    feats = rs.randn(G, P, C).astype(np.float32)
    valid = rs.rand(G, P) > 0.2
    fc, ff, fv = jax.jit(
        lambda l, f, v: unique_voxels_classes(l, f, v, CAP, mode="mean")
    )(jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(valid))

    for K in (3, 5):
        w = jnp.asarray(rs.randn(G, K ** 3, C, C).astype(np.float32) * .1)
        ref = jax.jit(lambda c, v, f, w, K=K:
                      scan_conv_grouped_classes(c, v, f, 1, K, w))(
                          fc, fv, ff, w)
        out = jax.jit(lambda c, v, f, w, K=K:
                      subm_conv_classes_mxu(c, v, f, w, K))(fc, fv, ff, w)
        check(f"fwd_k{K}", _rel_err(out, ref), 2e-2)

        def loss_mxu(f, ww, K=K):
            return jnp.sum(subm_conv_classes_mxu(fc, fv, f, ww, K) ** 2)

        def loss_ref(f, ww, K=K):
            return jnp.sum(
                scan_conv_grouped_classes(fc, fv, f, 1, K, ww) ** 2)

        g1 = jax.jit(jax.grad(loss_mxu, argnums=(0, 1)))(ff, w)
        g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(ff, w)
        check(f"bwd_dfeats_k{K}", _rel_err(g1[0], g2[0]), 5e-2)
        check(f"bwd_dw_k{K}", _rel_err(g1[1], g2[1]), 5e-2)

    # conv-at-coords (the RoI head's grid_conv)
    P2, CAP2, QN, QCAP = 3000, 2048, 1500, 512
    lat2 = rs.randint(0, 16, (P2, 3)).astype(np.int32)
    f2 = rs.randn(P2, C).astype(np.float32)
    v2 = rs.rand(P2) > 0.2
    st, _ = jax.jit(lambda l, f, v: unique_voxels(l, f, v, CAP2,
                                                  mode="mean"))(
        jnp.asarray(lat2), jnp.asarray(f2), jnp.asarray(v2))
    qpts = rs.randint(0, 16, (QN, 3)).astype(np.int32)
    qv = rs.rand(QN) > 0.3
    qded, _ = jax.jit(lambda l, f, v: unique_voxels(l, f, v, QCAP,
                                                    mode="first"))(
        jnp.asarray(qpts), jnp.zeros((QN, 1), np.float32),
        jnp.asarray(qv))
    w5 = jnp.asarray(rs.randn(125, C, C).astype(np.float32) * 0.1)
    out = jax.jit(lambda c, v, f, q, qv:
                  conv_at_coords_mxu(c, v, f, 1, q, qv, 5, w5))(
        st.coords, st.valid, st.masked_feats(), qded.coords, qded.valid)
    ref = jax.jit(lambda c, v, f, q, qv:
                  scan_conv_grouped(c, v, f, 1, q, qv, 5, w5))(
        st.coords, st.valid, st.feats, qded.coords, qded.valid)
    check("conv_at_coords_fwd_k5", _rel_err(out, ref), 2e-2)

    # sorted-run segment sums (the head's fine-map fast path)
    from cagroup3d_tpu.core.hashing import INVALID_KEY, pack_coords
    from cagroup3d_tpu.ops.pallas_segsum import sorted_segment_sums
    G3, P3, F3, cap3 = 4, 2048, 64, 256
    lat3 = rs.randint(0, 12, (G3, P3, 3)).astype(np.int32)
    v3 = rs.rand(G3, P3) > 0.2
    f3 = rs.randn(G3, P3, F3).astype(np.float32)
    keys3 = np.asarray(pack_coords(jnp.asarray(lat3), jnp.asarray(v3)))
    order3 = np.argsort(keys3, axis=1, kind="stable")
    sk3 = np.take_along_axis(keys3, order3, axis=1)
    fs3 = np.take_along_axis(f3, order3[..., None], axis=1)
    fs3[sk3 == int(INVALID_KEY)] = 0.0
    out3, cnt3 = jax.jit(lambda k, f: sorted_segment_sums(k, f, cap3))(
        jnp.asarray(sk3), jnp.asarray(fs3))
    # XLA oracle: bf16 one-hot segment sums over the same sorted rows
    skj = jnp.asarray(sk3)
    head3 = jnp.concatenate(
        [jnp.ones((G3, 1), bool), skj[:, 1:] != skj[:, :-1]], axis=1)
    ok3 = skj != INVALID_KEY
    uid3 = jnp.cumsum((head3 & ok3).astype(jnp.int32), axis=1) - 1
    seg3 = jnp.where(ok3 & (uid3 < cap3), uid3, cap3) + \
        (jnp.arange(G3, dtype=jnp.int32) * (cap3 + 1))[:, None]
    rsum = jnp.zeros((G3 * (cap3 + 1), F3), jnp.float32).at[
        seg3.reshape(-1)].add(
            jnp.asarray(fs3).astype(jnp.bfloat16).astype(jnp.float32)
            .reshape(-1, F3)).reshape(G3, cap3 + 1, F3)[:, :cap3]
    rcnt = jnp.zeros((G3 * (cap3 + 1),), jnp.int32).at[
        seg3.reshape(-1)].add(ok3.astype(jnp.int32).reshape(-1)
                              ).reshape(G3, cap3 + 1)[:, :cap3]
    check("segsum_fwd", _rel_err(out3, rsum), 2e-2)
    check("segsum_cnt", float((np.asarray(cnt3) !=
                               np.asarray(rcnt)).sum()), 1)

    status = "FAIL" if failed else "PASS"
    print(json.dumps({"smoke": status, "backend": backend,
                      "n_checks": len(checks)}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
