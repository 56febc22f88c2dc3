"""Microbenchmark of the dense head's paired fine+expand map build.

Reproduces the eval workload (G=18 classes, P=2*32768 candidate rows,
F=64) of unique_voxels_classes_paired (core/voxelize.py), the reported
~19 ms item of the eval breakdown.  Iterations chain through a data
dependency (remote-tunnel timing rule, .claude/skills/verify).

Usage: G=18 P=65536 F=64 OCC=1.0 ITERS=20 python tools/bench_head_maps.py
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
    from cagroup3d_tpu.core.voxelize import unique_voxels_classes_paired

    G = int(os.environ.get("G", 18))
    P = int(os.environ.get("P", 65536))
    F = int(os.environ.get("F", 64))
    cap_f = int(os.environ.get("CAP_FINE", 4096))
    cap_c = int(os.environ.get("CAP_COARSE", 2048))
    occ = float(os.environ.get("OCC", 1.0))
    iters = int(os.environ.get("ITERS", 20))

    rs = np.random.RandomState(0)
    # head-shaped inputs: per-class metric points on per-class lattices
    # (~40^3 boxes at ScanNet scale), shared feature rows
    lat = rs.randint(0, 40, (G, P, 3)).astype(np.int32)
    feats = rs.randn(P, F).astype(np.float32)
    sel = rs.rand(G, P) < occ

    latj = jnp.asarray(lat)
    featsj = jnp.asarray(feats)
    selj = jnp.asarray(sel)

    @jax.jit
    def run(carry, lat, feats, sel):
        (fc, ff, fv), (cc, cf, cv), (off, ofc) = \
            unique_voxels_classes_paired(lat, feats + carry * 1e-12, sel,
                                         cap_f, cap_c, 3,
                                         return_stats=True)
        return (jnp.sum(ff) + jnp.sum(cf) +
                jnp.sum(fc) * 1e-9 + jnp.sum(fv) * 1e-9)

    t0 = time.time()
    r = float(run(jnp.float32(0.0), latj, featsj, selj))
    print(f"compile {time.time()-t0:.1f}s  r0={r:.4f}", file=sys.stderr)

    t0 = time.time()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = run(c, latj, featsj, selj)
    r = float(c)
    dt = (time.time() - t0) / iters * 1000
    print(f'{{"paired_maps_ms": {dt:.2f}, "G": {G}, "P": {P}, '
          f'"cap_fine": {cap_f}, "occ": {occ}}}')


if __name__ == "__main__":
    main()
