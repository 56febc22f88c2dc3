"""Device-bound training-step benchmark: B=2 scenes, 5 optimizer steps
scanned in ONE dispatch (per-step dispatch through a remote-TPU tunnel
costs ~10x in handle round trips).  The batch MUST be a jit argument —
closed-over literals are corrupted by the remote compile path (see
.claude/skills/verify/SKILL.md).

Usage: python tools/bench_train.py [B=2] [CAP=65536] [FCAP=4096] [MXU_TRAIN=1]
Prints one line: train_step_ms.
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
    import optax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/cagroup3d_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from __graft_entry__ import _build_model
    from cagroup3d_tpu.utils.synthetic import synthetic_batch

    B = int(os.environ.get("B", 2))
    cap = int(os.environ.get("CAP", 65536))
    fcap = int(os.environ.get("FCAP", 4096))
    model = _build_model(tiny=False, input_cap=cap, fine_cap=fcap)
    if os.environ.get("MXU_TRAIN"):   # "1"/"0" override (default now on)
        model.model_cfg.MXU_TRAIN = os.environ["MXU_TRAIN"] == "1"
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch_size=B, n_points=100_000,
                        point_cap=100_000)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(1e-3, weight_decay=1e-4))
    opt = tx.init(P)
    nstep = int(os.environ.get("NSTEP", 5))

    @jax.jit
    def run(P, S, opt, keys, batch):
        def one(carry, r):
            P, S, opt = carry

            def loss_fn(P):
                loss, tb, upd = model.forward_train(P, S, batch, r,
                                                    cur_epoch=5)
                return loss, upd

            (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(P)
            updates, opt = tx.update(g, opt, P)
            P = optax.apply_updates(P, updates)
            S = {**S, **upd}
            return (P, S, opt), loss

        (P, S, opt), losses = jax.lax.scan(one, (P, S, opt), keys)
        return losses[-1]

    keys = jax.random.split(jax.random.PRNGKey(1), nstep)
    t0 = time.time()
    loss = float(run(P, S, opt, keys, batch))
    print(f"compile+{nstep} steps: {time.time()-t0:.0f}s "
          f"loss={loss:.3f}", file=sys.stderr)
    assert np.isfinite(loss), loss
    t0 = time.time()
    loss = float(run(P, S, opt, keys, batch))
    dt = (time.time() - t0) / nstep
    print(f"train_step_ms={dt*1e3:.0f} caps={cap}/{fcap} B={B}")


if __name__ == "__main__":
    main()
