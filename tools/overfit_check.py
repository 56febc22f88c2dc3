"""Synthetic-overfit mAP gate (SURVEY plan M3 / round-1 VERDICT item 7).

No dataset ships in this environment, so this is the only end-to-end
proof that assigner -> losses -> optimizer -> NMS -> evaluator all point
the same way: train the tiny CAGroup3D config on 10 fixed synthetic
scenes and require mAP@0.25 >= 0.9 on them through the real indoor_eval
metric (the reference's own eval protocol,
pcdet/datasets/scannet/scannet_object_eval_python/eval.py).

Usage: python tools/overfit_check.py [--steps 300] [--threshold 0.9]
Prints one JSON line {"map25": ..., "map50": ..., "steps": N, "ok": bool}.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # 2400: measured 1.0 mAP@0.25 on-chip, recorded in OVERFIT_r05.json
    # (1200 plateaus at ~0.897, under the 0.9 gate)
    ap.add_argument("--steps", type=int, default=2400)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--lr", type=float, default=1.5e-3)
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument("--ab", action="store_true",
                    help="capacity A/B: re-eval the trained weights under "
                         "tight caps that force overflow drops and bound "
                         "the mAP@0.25 delta (SURVEY hard-part #1)")
    ap.add_argument("--ab_budget", type=float, default=0.05)
    ap.add_argument("--yaw", action="store_true",
                    help="SUN RGB-D-style yaw path: 8-dim regression, "
                         "sin/cos box coder, rotated-IoU loss, yaw NMS "
                         "(reference sunrgbd_models/CAGroup3D.yaml:44-47,68)"
                         " on rotated synthetic boxes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/cagroup3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from test_detector import tiny_cfg, synthetic_batch
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.datasets.indoor_eval import indoor_eval

    rng = np.random.RandomState(0)
    n_cls = 4
    cfg = tiny_cfg(n_classes=n_cls, with_yaw=args.yaw)
    cfg.DENSE_HEAD.FINE_CAP = 1024
    cfg.DENSE_HEAD.EXPAND_CAP = 512
    model = build_network(cfg, num_class=n_cls)
    P, S = jax.jit(model.init)(jax.random.PRNGKey(0))

    data = synthetic_batch(rng, B=args.scenes, P=1200, G=8,
                           n_classes=n_cls, yaw=args.yaw)

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(args.lr, weight_decay=1e-4))
    opt = tx.init(P)

    B = 2

    def step(P, S, opt, batch, r):
        def loss_fn(P):
            loss, tb, upd = model.forward_train(P, S, batch, r, cur_epoch=5)
            return loss, (tb, upd)
        (loss, (tb, upd)), g = jax.value_and_grad(loss_fn, has_aux=True)(P)
        updates, opt = tx.update(g, opt, P)
        P = optax.apply_updates(P, updates)
        S = {**S, **upd}
        return P, S, opt, loss, tb

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(args.steps):
        ids = rng.choice(args.scenes, B, replace=False)
        batch = {k: jnp.asarray(np.asarray(v)[ids]) for k, v in data.items()}
        key, sub = jax.random.split(key)
        P, S, opt, loss, tb = jstep(P, S, opt, batch, sub)
        if it % 50 == 0:
            print(f"step {it}: loss {float(loss):.3f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s",
          file=sys.stderr)

    def evaluate(eval_model):
        """Batch-1 eval of the trained weights through indoor_eval;
        returns (mAP@0.25, mAP@0.50, total overflow-dropped voxels)."""
        feval = jax.jit(lambda P, S, b: eval_model.forward_eval(
            P, S, b, cur_epoch=100))
        dt_annos, gt_annos = [], []
        overflow = 0
        for i in range(args.scenes):
            b1 = {k: jnp.asarray(np.asarray(v)[i:i + 1])
                  for k, v in data.items()}
            out = feval(P, S, {"points": b1["points"],
                               "points_valid": b1["points_valid"]})
            overflow += int(np.asarray(out.get("overflow", 0)).sum())
            v = np.asarray(out["pred_valid"][0])
            boxes = np.asarray(out["pred_boxes"][0])[v]
            scores = np.asarray(out["pred_scores"][0])[v]
            labels = np.asarray(out["pred_labels"][0])[v]
            dt_annos.append(dict(boxes_3d=boxes[:, :7], scores_3d=scores,
                                 labels_3d=labels))
            gm = np.asarray(data["gt_valid"][i])
            gb = np.asarray(data["gt_boxes"][i])[gm]
            gt_annos.append(dict(gt_num=len(gb),
                                 gt_boxes_upright_depth=gb[:, :7],
                                 **{"class": gb[:, 7].astype(np.int64)}))
        label2cat = {i: f"c{i}" for i in range(n_cls)}
        ret = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], label2cat)
        return (float(ret.get("mAP_0.25", 0.0)),
                float(ret.get("mAP_0.50", 0.0)), overflow)

    m25, m50, ovf = evaluate(model)
    ok = m25 >= args.threshold
    result = dict(map25=round(m25, 4), map50=round(m50, 4),
                  steps=args.steps, overflow=ovf, yaw=bool(args.yaw),
                  ok=bool(ok))

    if args.ab:
        # same trained weights, capacities LOOSENED until nothing is
        # dropped: the mAP delta between the overflowing default run and
        # the no-overflow run is the drop policy's true cost (params are
        # capacity-independent, so P/S transfer as-is).  Requires the
        # default run to have actually dropped voxels, else the A/B is
        # vacuous.
        import copy
        loose = copy.deepcopy(cfg)
        loose.INPUT_CAP = 2048
        loose.BACKBONE_3D.CAPS = {k: v * 2
                                  for k, v in model.backbone_3d.caps.items()}
        # EXPAND_CAP must absorb the x27 neighborhood expansion (the
        # dominant dropper: unique coarse voxels can approach 27x the
        # fine selection); GRID_CAP must absorb all RoI grid queries
        # (MAX_ROIS x GRID_SIZE^3) — together these make the loose arm
        # near-drop-free
        loose.DENSE_HEAD.FINE_CAP = 4096
        loose.DENSE_HEAD.EXPAND_CAP = 16384
        loose.ROI_HEAD.GRID_CAP = 16384
        model_l = build_network(loose, num_class=n_cls)
        l25, l50, l_ovf = evaluate(model_l)
        delta = l25 - m25
        # valid A/B: the default arm actually drops, the loose arm is
        # (near-)drop-free, and the mAP moves less than the budget
        ab_ok = ovf > 0 and l_ovf < 0.05 * ovf \
            and abs(delta) <= args.ab_budget
        result.update(ab_loose_map25=round(l25, 4),
                      ab_loose_map50=round(l50, 4),
                      ab_loose_overflow=l_ovf, ab_delta=round(delta, 4),
                      ab_budget=args.ab_budget, ab_ok=bool(ab_ok))
        ok = ok and ab_ok

    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
