"""Backbone-internal bisected profile: cumulative prefix timing.

Same prefix-DCE technique as tools/profile_eval.py, but the cuts are
INSIDE BiResNet (biresnet.py ``stop_after``): XLA dead-code-eliminates
everything past the cut, so each measurement is the true cumulative
cost of vox + that backbone prefix.  Cuts keep both bilateral branches
live where they interleave (fuse3/fuse4/layer5 return tuples).

  stem    vox + 2 stride-1 k3 convs (INPUT_CAP rows)
  layer1  + 2 BasicBlocks at stride 2
  layer2  + 2 BasicBlocks at stride 4
  fuse3   + layer3 / layer3_ / down3 / compression3 fusion
  fuse4   + layer4 / layer4_ / down4 x2 / compression4 fusion
  layer5  + both Bottlenecks
  spp     + DAPPM pyramid + final fusion
  full    + out head (transpose up k2 + k1)  == profile_eval's backbone

Iterations chain through a data dependency (remote-tunnel timing rule,
.claude/skills/verify).

Usage: BENCH_INPUT_CAP=65536 ITERS=10 python tools/profile_backbone.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STAGES = ["stem", "layer1", "layer2", "fuse3", "fuse4", "layer5", "spp",
          "full"]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.core.module import Ctx
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    input_cap = int(os.environ.get("BENCH_INPUT_CAP", 65536))
    iters = int(os.environ.get("ITERS", 10))
    stages = os.environ.get("STAGES", ",".join(STAGES)).split(",")

    model = _build_model(tiny=False, input_cap=input_cap, fine_cap=4096)
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_np = synthetic_batch(rng, batch_size=1, n_points=100_000,
                               point_cap=100_000)
    points = jnp.asarray(batch_np["points"])[0]
    pvalid = jnp.asarray(batch_np["points_valid"])[0]

    def tree_sum(x):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(x))

    def make_step(stage):
        @jax.jit
        def step(carry, P, S, points, pvalid):
            pts = points.at[:, 0].add(carry * 1e-12)
            ctx = Ctx(train=False, axis_name=None,
                      rng=jax.random.PRNGKey(0))
            st, _, _ = model._voxelize_scene(pts, pvalid)
            out = model.backbone_3d(
                P, S, ctx, st,
                stop_after=None if stage == "full" else stage)
            return tree_sum([t.feats for t in jax.tree_util.tree_leaves(
                out, is_leaf=lambda l: hasattr(l, "feats"))])
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
                      "input_cap": input_cap}))


if __name__ == "__main__":
    main()
