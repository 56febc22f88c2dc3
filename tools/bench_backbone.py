"""Per-conv attribution microbench of the BiResNet backbone on the chip.

The stage-bisected profile (tools/profile_eval.py) puts the backbone at
~53.5 ms of the 83 ms eval budget.  This tool times every distinct conv
configuration the backbone runs at eval (biresnet.py __call__), on
coordinate tables produced by the REAL voxelize + stride_reduce pipeline
from a synthetic 100k-point scene, and multiplies by the instance count
to reconstruct the backbone total — so optimization work can target the
measured hot shapes instead of guesses.

Iterations chain through a data dependency (remote-tunnel timing rule,
.claude/skills/verify).

Usage: ITERS=20 python tools/bench_backbone.py [--xla_stem] [--quick]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from cagroup3d_tpu.core.kernel_maps import (conv_offsets,
                                                neighbor_table,
                                                neighbor_table_grouped,
                                                transpose_offsets)
    from cagroup3d_tpu.core.sparse import SparseTensor
    from cagroup3d_tpu.core.sparse_conv import gather_gemm
    from cagroup3d_tpu.core.voxelize import (stride_reduce_coords,
                                             voxelize_points)
    from cagroup3d_tpu.ops.pallas_conv import (conv_at_coords_mxu,
                                               subm_conv_mxu)
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    iters = int(os.environ.get("ITERS", 20))
    input_cap = int(os.environ.get("BENCH_INPUT_CAP", 65536))
    voxel = float(os.environ.get("VOXEL", 0.04))

    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, batch_size=1, n_points=100_000,
                            point_cap=100_000)
    pts = jnp.asarray(batch["points"])[0]
    pv = jnp.asarray(batch["points_valid"])[0]

    caps = {1: input_cap, 2: input_cap // 2, 4: input_cap // 4,
            8: input_cap // 8, 16: input_cap // 16, 32: input_cap // 32}

    @jax.jit
    def build_tables(pts, pv):
        st1, _ = voxelize_points(pts[:, :3], pts[:, 3:], pv, voxel,
                                 caps[1])
        sts = {1: st1}
        st = st1
        for s in (2, 4, 8, 16, 32):
            st, _ = stride_reduce_coords(st, 2, caps[s])
            sts[s] = st
        return {s: (t.coords, t.valid) for s, t in sts.items()}

    tabs = build_tables(pts, pv)
    tabs = {s: (np.asarray(c), np.asarray(v)) for s, (c, v) in tabs.items()}
    nvalid = {s: int(v.sum()) for s, (c, v) in tabs.items()}
    print(f"valid rows per stride: "
          f"{ {s: nvalid[s] for s in sorted(nvalid)} }", file=sys.stderr)

    rs = np.random.RandomState(1)

    def st_of(s, C):
        c, v = tabs[s]
        f = jnp.asarray(
            rs.randn(c.shape[0], C).astype(np.float32) * v[:, None])
        return SparseTensor(jnp.asarray(c), f, jnp.asarray(v), s)

    def timeit(name, fn, args, count):
        # ALL iterations inside ONE jit dispatch (lax.fori_loop, data-
        # chained carry): cross-call chaining through the remote tunnel
        # adds 1.5-3 ms/call of dispatch noise that swamped the small
        # cases in the first version of this tool.
        @jax.jit
        def run(c, *args):
            return jax.lax.fori_loop(
                0, iters, lambda i, cc: fn(cc, *args), c)

        t0 = time.time()
        r = float(run(jnp.float32(0.0), *args))
        comp = time.time() - t0
        t0 = time.time()
        r2 = float(run(jnp.float32(0.0), *args))
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:34s} {dt:7.2f} ms x{count:2d} = {dt*count:7.2f} ms"
              f"   (compile {comp:.0f}s, r={r:.3g})")
        return dt * count

    total = 0.0

    # ---- MXU submanifold convs ------------------------------------
    def mxu_subm(st, w):
        def f(carry, coords, valid, feats, w):
            out = subm_conv_mxu(coords, valid, feats + carry * 1e-12, w,
                                3, st.stride)
            return jnp.sum(out)
        return f

    subm_cases = [
        # (stride, Cin, Cout, instance count, label)
        (1, 3, 64, 1, "stem conv1.0 (s1 3->64)"),
        (2, 64, 64, 3, "layer1 subm (s2 64->64)"),
        (4, 128, 128, 12, "s4 subm 128 (l2/l3_/l4_/l5_)"),
        (8, 256, 256, 3, "layer3 subm (s8 256)"),
        (16, 512, 512, 3, "layer4 subm (s16 512)"),
        (32, 128, 128, 4, "dappm process (s32 128)"),
    ]
    for s, cin, cout, cnt, label in subm_cases:
        st = st_of(s, cin)
        w = jnp.asarray(rs.randn(27, cin, cout).astype(np.float32) * .05)
        total += timeit(f"MXU {label}", mxu_subm(st, w),
                        (st.coords, st.valid, st.feats, w), cnt)

    # ---- stem conv1.3: XLA today (VMEM gate), MXU for comparison ---
    st = st_of(1, 64)
    w = jnp.asarray(rs.randn(27, 64, 64).astype(np.float32) * .05)

    def xla_subm(carry, coords, valid, feats, w):
        stx = SparseTensor(coords, feats + carry * 1e-12, valid, 1)
        nbr = neighbor_table_grouped(stx, coords, valid, 3)
        out = gather_gemm(stx.feats, nbr, w, None,
                          compute_dtype=jnp.bfloat16)
        return jnp.sum(out)

    total += timeit("XLA stem conv1.3 (s1 64->64)", xla_subm,
                    (st.coords, st.valid, st.feats, w), 1)
    if "--xla_stem" not in sys.argv:
        timeit("MXU stem conv1.3 (s1 64->64)", mxu_subm(st, w),
               (st.coords, st.valid, st.feats, w), 0)

    # ---- strided down convs (MXU conv-at-coords) -------------------
    down_cases = [
        (1, 2, 64, 64, 1, "layer1 down (s1->2 64)"),
        (2, 4, 64, 128, 1, "layer2 down (s2->4 64->128)"),
        (4, 8, 128, 256, 3, "s4->8 down 128->256 (l3/d3/d4)"),
        (8, 16, 256, 512, 2, "s8->16 down 256->512 (l4/d4.3)"),
        (16, 32, 512, 512, 1, "layer5 down (s16->32 512)"),
    ]
    for s, s2, cin, cout, cnt, label in down_cases:
        st = st_of(s, cin)
        c2, v2 = tabs[s2]
        qlat = jnp.asarray(c2 // s)
        qv = jnp.asarray(v2)
        w = jnp.asarray(rs.randn(27, cin, cout).astype(np.float32) * .05)

        def down_f(carry, coords, valid, feats, qlat, qv, w, s=s):
            out = conv_at_coords_mxu(coords, valid, feats + carry * 1e-12,
                                     s, qlat, qv, 3, w)
            return jnp.sum(out)

        total += timeit(f"MXU {label}", down_f,
                        (st.coords, st.valid, st.feats, qlat, qv, w), cnt)

    # ---- out.0: k2 transposed conv s4 -> s2 (XLA gather path) -------
    st = st_of(4, 256)
    c2, v2 = tabs[2]
    offs = transpose_offsets(2, 2)
    w = jnp.asarray(rs.randn(8, 256, 256).astype(np.float32) * .05)

    def up_f(carry, coords, valid, feats, tgt_c, tgt_v, w):
        stx = SparseTensor(coords, feats + carry * 1e-12, valid, 4)
        nbr = neighbor_table(stx, tgt_c, tgt_v, offs)
        out = gather_gemm(stx.feats, nbr, w, None,
                          compute_dtype=jnp.bfloat16)
        return jnp.sum(out)

    total += timeit("XLA out.0 up k2 (s4->s2 256)", up_f,
                    (st.coords, st.valid, st.feats, jnp.asarray(c2),
                     jnp.asarray(v2), w), 1)

    # ---- k1 convs (plain matmuls, counted coarsely) -----------------
    def k1_f(carry, feats, w):
        return jnp.sum((feats + carry * 1e-12) @ w)

    st = st_of(4, 128)
    w = jnp.asarray(rs.randn(128, 128).astype(np.float32) * .05)
    total += timeit("k1 matmuls (s4 128, proxy)", k1_f,
                    (st.feats, w), 12)

    print(f"\nreconstructed backbone conv total ~= {total:.1f} ms")


if __name__ == "__main__":
    main()
