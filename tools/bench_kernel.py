"""Microbenchmark of the MXU Pallas conv kernel on the real chip.

Reproduces the dense head's k9 per-class conv workload (G=18 classes,
N=FINE_CAP table, C=64) plus the k5 expand conv, prints ms per call.
Iterations chain through a data dependency (remote-tunnel timing rule,
see .claude/skills/verify).

Usage: K=9 G=18 N=4096 C=64 ITERS=20 python tools/bench_kernel.py
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
    from cagroup3d_tpu.core.voxelize import unique_voxels_classes
    from cagroup3d_tpu.ops.pallas_conv import subm_conv_classes_mxu
    from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped_classes

    K = int(os.environ.get("K", 9))
    G = int(os.environ.get("G", 18))
    N = int(os.environ.get("N", 4096))
    C = int(os.environ.get("C", 64))
    iters = int(os.environ.get("ITERS", 20))
    occupancy = float(os.environ.get("OCC", 1.0))

    rs = np.random.RandomState(0)
    # class-grouping-shaped tables: coords in a head-fine-lattice-sized
    # box, ~N valid rows per class at occupancy 1.0
    side = max(4, int(round((N / 0.6) ** (1 / 3))))
    P = N * 2
    lat = rs.randint(0, side, (G, P, 3)).astype(np.int32)
    feats = rs.randn(G, P, C).astype(np.float32)
    valid = rs.rand(G, P) < occupancy
    fc, ff, fv = jax.jit(
        lambda l, f, v: unique_voxels_classes(l, f, v, N, mode="mean")
    )(jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(valid))
    nvalid = int(np.asarray(fv).sum())
    w = jnp.asarray(rs.randn(G, K ** 3, C, C).astype(np.float32) * 0.05)

    @jax.jit
    def run(carry, fc, fv, ff, w):
        out = subm_conv_classes_mxu(fc, fv, ff + carry * 1e-12, w, K)
        return jnp.sum(out)

    args = (fc, fv, ff, w)
    t0 = time.time()
    r0 = float(run(jnp.float32(0.0), *args))
    print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)
    # exactness vs the XLA path, on-device
    ref = float(jax.jit(
        lambda fc, fv, ff, w: jnp.sum(
            scan_conv_grouped_classes(fc, fv, ff, 1, K, w)))(*args))
    rel = abs(r0 - ref) / (abs(ref) + 1e-9)
    t0 = time.time()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = run(c, *args)
    _ = float(c)
    dt = (time.time() - t0) / iters * 1e3
    print(f"k{K} G={G} N={N} C={C} occ={occupancy} valid/cls="
          f"{nvalid/G:.0f}: {dt:.1f} ms  (sum rel err vs XLA {rel:.2e})")


if __name__ == "__main__":
    main()
