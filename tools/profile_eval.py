"""Stage-bisected eval profile: cumulative pipeline-prefix timing.

Times the batch-1 eval forward (the bench.py workload) cut after each
stage; XLA dead-code-eliminates everything a stage's output does not
depend on, so each measurement is the true cumulative cost of the
prefix:

  vox        voxelize (points -> stride-1 sparse tensor)
  backbone   + BiResNet
  head       + dense head forward (class-aware grouping + per-class convs)
  proposals  + get_bboxes (decode + NMS)
  full       + RoI head forward_test (= the bench.py number)

Iterations chain through a data dependency and fetch once (remote-tunnel
timing rule, .claude/skills/verify).  Stage deltas are printed at the
end.  STAGES env var selects a comma-separated subset.

Usage: BENCH_INPUT_CAP=65536 BENCH_FINE_CAP=4096 ITERS=10 \
       python tools/profile_eval.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STAGES = ["vox", "backbone", "head", "proposals", "full"]


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
    iters = int(os.environ.get("ITERS", 10))
    stages = os.environ.get("STAGES", ",".join(STAGES)).split(",")

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

    def make_step(stage):
        @jax.jit
        def step(carry, P, S, points, pvalid):
            pts = points.at[:, 0].add(carry * 1e-12)
            ctx, st, origin, pts_norm, feat, head_out, props = \
                model._forward_scene(P, False, S, pts, pvalid, sem_thr,
                                     jax.random.PRNGKey(0),
                                     axis_name=None)
            if stage == "vox":
                return tree_sum((st.feats, st.coords))
            if stage == "backbone":
                return tree_sum(feat.feats)
            if stage == "head":
                return tree_sum(head_out)
            if stage == "proposals":
                return tree_sum(props)
            out = model.roi_head.forward_test(
                P, S, ctx, feat, props[0], props[1],
                props[2].astype(jnp.int32), props[3])
            return tree_sum(out["batch_score_preds"])
        return step

    results = {}
    for stage in stages:
        step = make_step(stage)
        t0 = time.time()
        r = float(step(jnp.float32(0.0), P, S, points, pvalid))
        compile_s = time.time() - t0
        t0 = time.time()
        c = jnp.float32(0.0)
        for _ in range(iters):
            c = step(c, P, S, points, pvalid)
        _ = float(c)
        dt = (time.time() - t0) / iters * 1000
        results[stage] = dt
        print(f"# {stage}: {dt:.1f} ms (compile {compile_s:.0f}s, "
              f"r={r:.3g})", file=sys.stderr, flush=True)

    deltas = {}
    prev = 0.0
    for stage in STAGES:
        if stage in results:
            deltas[stage] = round(results[stage] - prev, 1)
            prev = results[stage]
    print(json.dumps({"cumulative_ms": {k: round(v, 1)
                                        for k, v in results.items()},
                      "stage_delta_ms": deltas,
                      "input_cap": input_cap, "fine_cap": fine_cap}))


if __name__ == "__main__":
    main()
