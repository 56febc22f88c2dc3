"""Stage-bisected backward profile: which stage owns the ~5 s backward.

grad targets (all at full caps, B=2, vmapped train mode):
  A  backbone only: d/dP sum(backbone feats)
  B  + dense head forward
  C  + head get_bboxes + roi head forward (no losses)
  D  full loss (reference number)
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
    from cagroup3d_tpu.core.module import Ctx
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    cap = int(os.environ.get("CAP", 65536))
    fcap = int(os.environ.get("FCAP", 4096))
    nstep = int(os.environ.get("NSTEP", 3))
    model = _build_model(tiny=False, input_cap=cap, fine_cap=fcap)
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch_size=2, n_points=100_000,
                        point_cap=100_000)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    def scene_stage(P, S, points, pvalid, r, stage):
        ctx = Ctx(train=True, axis_name="scene", rng=r)
        ctx.mxu_train = bool(model.model_cfg.get("MXU_TRAIN", False))
        st, origin, pts_norm = model._voxelize_scene(points, pvalid,
                                                     stats=ctx.stats)
        feat = model.backbone_3d(P, S, ctx, st)
        if stage == "A":
            return jnp.sum(feat.feats * feat.valid[:, None])
        head_out = model.dense_head.forward(P, S, ctx, feat,
                                            jnp.float32(0.15))
        acc = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(head_out)
                  if hasattr(v, "dtype") and
                  v.dtype in (jnp.float32, jnp.bfloat16))
        if stage == "B":
            return acc
        rois, roi_scores, roi_labels, roi_valid = \
            model.dense_head.get_bboxes(head_out, training=True)
        roi_out = model.roi_head.forward_train(
            P, S, ctx, feat, rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid,
            jnp.zeros((64, 7)).at[:, 3:6].set(1.0),
            jnp.zeros((64,), jnp.int32), jnp.zeros((64,), bool))
        acc2 = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(roi_out)
                   if hasattr(v, "dtype") and
                   v.dtype in (jnp.float32, jnp.bfloat16))
        return acc + acc2

    def make(stage):
        def loss(P, key, batch):
            rngs = jax.random.split(key, 2)
            vals = jax.vmap(
                lambda pts, pv, r: scene_stage(P, S, pts, pv, r, stage),
                axis_name="scene")(batch["points"],
                                   batch["points_valid"], rngs)
            return jnp.sum(vals)
        return loss

    def time_grad(name, lossfn):
        @jax.jit
        def run(P, key, batch):
            def one(acc, r):
                g = jax.grad(lossfn)(P, r, batch)
                return acc + sum(jnp.sum(jnp.abs(v))
                                 for v in g.values()), None
            keys = jax.random.split(key, nstep)
            acc, _ = jax.lax.scan(one, jnp.float32(0.0), keys)
            return acc

        t0 = time.time()
        v = float(run(P, jax.random.PRNGKey(1), batch))
        t1 = time.time()
        v = float(run(P, jax.random.PRNGKey(2), batch))
        t2 = time.time()
        print(f"{name}: compile {t1-t0:.0f}s, steady "
              f"{(t2-t1)/nstep*1000:.0f} ms/step", flush=True)

    time_grad("A backbone      ", make("A"))
    time_grad("B +dense head   ", make("B"))
    time_grad("C +bboxes+roi   ", make("C"))


if __name__ == "__main__":
    main()
