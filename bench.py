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
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    input_cap = int(os.environ.get("BENCH_INPUT_CAP", 65536))
    fine_cap = int(os.environ.get("BENCH_FINE_CAP", 8192))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    model = _build_model(tiny=False, input_cap=input_cap, fine_cap=fine_cap)
    P, S = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch_np = synthetic_batch(rng, batch_size=1, n_points=100_000,
                               point_cap=100_000)
    batch = {k: jnp.asarray(batch_np[k])
             for k in ("points", "points_valid")}

    fn = jax.jit(lambda P, S, b: model.forward_eval(P, S, b, cur_epoch=10))
    t0 = time.time()
    jax.block_until_ready(fn(P, S, batch))
    compile_s = time.time() - t0
    # steady state
    t0 = time.time()
    for _ in range(iters):
        out = fn(P, S, batch)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    scenes_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": "scannet_e2e_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
    }))
    print(f"# latency {dt*1e3:.1f} ms/scene, compile {compile_s:.1f} s, "
          f"input_cap={input_cap}, fine_cap={fine_cap}", file=sys.stderr)


if __name__ == "__main__":
    main()
