"""Head-internal prefix-DCE profile: cumulative cuts inside the dense
head's eval forward (the +18.6 ms stage of tools/profile_eval.py).

Times vox+backbone plus the head cut after each sub-stage; XLA
dead-code-eliminates everything the cut's outputs do not depend on
(the same methodology as profile_eval/profile_backbone — trust these
deltas over standalone microbenches: the round-5 stem experiment showed
a conv that measures 15.8 ms standalone costs ~4 ms in context).

  backbone     vox + BiResNet only (head cut out entirely)
  sem_offsets  + semantic conv, offset block, feature_offset k3 conv
  maps         + paired fine/expand map build (sort + segment means)
  cls_convs    + per-class k9 fine and k5 expand MXU convs (+BN/elu)
  up_fuse      + generative up conv + fuse 1x1 (+BN/elu)
  head         + shared 1x1 prediction heads (= full head stage)

Iterations chain through a data dependency (remote-tunnel timing rule,
.claude/skills/verify).  Usage:
  BENCH_INPUT_CAP=65536 BENCH_FINE_CAP=4096 ITERS=20 \
      python tools/profile_head.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CUTS = ["backbone", "sem_offsets", "maps", "cls_convs", "up_fuse", "head"]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    input_cap = int(os.environ.get("BENCH_INPUT_CAP", 65536))
    fine_cap = int(os.environ.get("BENCH_FINE_CAP", 4096))
    iters = int(os.environ.get("ITERS", 20))
    cuts = os.environ.get("CUTS", ",".join(CUTS)).split(",")

    model = _build_model(tiny=False, input_cap=input_cap,
                         fine_cap=fine_cap)
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_np = synthetic_batch(rng, batch_size=1, n_points=100_000,
                               point_cap=100_000)
    points = jnp.asarray(batch_np["points"])[0]
    pvalid = jnp.asarray(batch_np["points_valid"])[0]
    sem_thr = model.semantic_threshold(10)

    def tree_sum(x):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(x))

    def make_step(cut):
        from cagroup3d_tpu.core.module import Ctx

        @jax.jit
        def step(carry, P, S, points, pvalid):
            pts = points.at[:, 0].add(carry * 1e-12)
            ctx = Ctx(train=False, axis_name=None,
                      rng=jax.random.PRNGKey(0))
            st, origin, pts_norm = model._voxelize_scene(
                pts, pvalid, stats=ctx.stats, drop_offset=None)
            feat = model.backbone_3d(P, S, ctx, st)
            if cut == "backbone":
                return tree_sum(feat.feats)
            out = model.dense_head.forward(
                P, S, ctx, feat, sem_thr,
                stop_after=None if cut == "head" else cut)
            return tree_sum(out)
        return step

    results = {}
    for cut in cuts:
        step = make_step(cut)
        t0 = time.time()
        r = float(step(jnp.float32(0.0), P, S, points, pvalid))
        compile_s = time.time() - t0
        t0 = time.time()
        c = jnp.float32(0.0)
        for _ in range(iters):
            c = step(c, P, S, points, pvalid)
        _ = float(c)
        dt = (time.time() - t0) / iters * 1000
        results[cut] = dt
        print(f"# {cut}: {dt:.1f} ms (compile {compile_s:.0f}s, "
              f"r={r:.3g})", file=sys.stderr, flush=True)

    deltas = {}
    prev = 0.0
    for cut in CUTS:
        if cut in results:
            deltas[cut] = round(results[cut] - prev, 1)
            prev = results[cut]
    print(json.dumps({"cumulative_ms": {k: round(v, 1)
                                        for k, v in results.items()},
                      "head_delta_ms": deltas,
                      "input_cap": input_cap, "fine_cap": fine_cap}))


if __name__ == "__main__":
    main()
