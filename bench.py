"""End-to-end benchmark: ScanNet-scale scene, full CAGroup3D eval forward
on one TPU chip.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference OpenPCDet port runs ~400 ms/scene end-to-end on
GPU (reference README.md:19) = 2.5 scenes/sec.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SCENES_PER_SEC = 2.5  # reference repo's own 400 ms/scene


def main():
    import jax
    import jax.numpy as jnp
    # persistent compile cache: the full-size eval graph is expensive to
    # compile (remote compile service); cache it across bench runs
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    # FINE_CAP 4096: per-class fine maps at 0.08-0.28 m voxels hold a few
    # thousand voxels even for scene-wide selections; the cap bounds the
    # head's (static-shape) per-class work.
    input_cap = int(os.environ.get("BENCH_INPUT_CAP", 65536))
    fine_cap = int(os.environ.get("BENCH_FINE_CAP", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    model = _build_model(tiny=False, input_cap=input_cap, fine_cap=fine_cap)
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_np = synthetic_batch(rng, batch_size=1, n_points=100_000,
                               point_cap=100_000)
    batch = {k: jnp.asarray(batch_np[k])
             for k in ("points", "points_valid")}

    # Iterations are chained through a data dependency (the previous
    # output perturbs the input) so the device executes them serially;
    # a single host fetch at the end avoids per-iteration host RTT
    # (block_until_ready alone does not reliably block through remote
    # TPU tunnels).
    @jax.jit
    def step(carry, P, S, points, points_valid):
        # params/inputs must be jit ARGUMENTS: closed-over arrays become
        # HLO literals and blow up the (remote) compile request
        pts = points + carry * 1e-12
        out = model.forward_eval(
            P, S, dict(points=pts, points_valid=points_valid),
            cur_epoch=10)
        return jnp.sum(out["pred_scores"])

    args = (P, S, batch["points"], batch["points_valid"])
    t0 = time.time()
    _ = float(step(jnp.float32(0.0), *args))
    compile_s = time.time() - t0
    t0 = time.time()
    c = jnp.float32(0.0)
    for _ in range(iters):
        c = step(c, *args)
    _ = float(c)  # waits for the whole dependent chain
    dt = (time.time() - t0) / iters
    scenes_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": "scannet_e2e_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        # cold-compile budget is tracked per round (VERDICT r4 #5);
        # 0.0 when the persistent cache was warm
        "compile_s": round(compile_s, 1),
    }))
    print(f"# latency {dt*1e3:.1f} ms/scene, compile {compile_s:.1f} s, "
          f"input_cap={input_cap}, fine_cap={fine_cap}", file=sys.stderr)


if __name__ == "__main__":
    main()
