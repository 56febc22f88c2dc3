"""Break down where the training step spends time on the TPU.

Times three jitted programs at full caps, B=2, same driving pattern as
bench_train (N chained iterations, one device fetch):
  fwd      vmapped train-mode forward (scene pipeline only)
  fwd+loss forward + dense/roi losses
  grad     value_and_grad of the full loss (no optimizer)

Usage: python tools/profile_train.py [CAP=65536] [FCAP=4096]
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
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    cap = int(os.environ.get("CAP", 65536))
    fcap = int(os.environ.get("FCAP", 4096))
    nstep = int(os.environ.get("NSTEP", 3))
    model = _build_model(tiny=False, input_cap=cap, fine_cap=fcap)
    if os.environ.get("MXU_TRAIN"):
        model.model_cfg.MXU_TRAIN = True
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch_size=2, n_points=100_000,
                        point_cap=100_000)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    def loss_fn(P, S, key, batch):
        loss, tb, upd = model.forward_train(P, S, batch, key, 0.0)
        return loss

    def fwd_only(P, S, key, batch):
        # scene pipeline without the loss assembly
        sem_thr = model.semantic_threshold(0.0)
        B = batch["points"].shape[0]
        rngs = jax.random.split(key, B)

        def scene(points, pvalid, r):
            ctx, st, origin, pts_norm, feat, head_out, props = \
                model._forward_scene(P, True, S, points, pvalid, sem_thr,
                                     r)
            acc = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(
                head_out) if v.dtype in (jnp.float32, jnp.bfloat16))
            return acc + jnp.sum(props[0])

        return jnp.sum(jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs))

    def time_prog(name, fn):
        @jax.jit
        def run(P, S, key, batch):
            def one(acc, r):
                v = fn(P, S, r, batch)
                return acc + v, None
            keys = jax.random.split(key, nstep)
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return acc

        t0 = time.time()
        v = float(run(P, S, jax.random.PRNGKey(1), batch))
        t1 = time.time()
        v = float(run(P, S, jax.random.PRNGKey(2), batch))
        t2 = time.time()
        print(f"{name}: compile+run {t1-t0:.1f}s, "
              f"steady {(t2-t1)/nstep*1000:.0f} ms/step (val={v:.3f})",
              flush=True)

    time_prog("fwd      ", fwd_only)
    time_prog("fwd+loss ", loss_fn)

    def grad_fn(P, S, key, batch):
        g = jax.grad(lambda p: loss_fn(p, S, key, batch))(P)
        return sum(jnp.sum(jnp.abs(v)) for v in g.values())

    time_prog("grad     ", grad_fn)


if __name__ == "__main__":
    main()
