"""Demo CLI (rebuild of reference tools/demo.py): run inference on raw
.bin/.npy point files and print (or dump) detected boxes.  Visualization
(open3d/mayavi in the reference) is replaced by a --out_file dump, since
the TPU hosts are headless."""
import argparse
import glob
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


class DemoDataset:
    def __init__(self, data_path, ext=".bin", point_cap=100_000):
        self.ext = ext
        data_path = Path(data_path)
        self.files = sorted(glob.glob(str(data_path / f"*{ext}"))) \
            if data_path.is_dir() else [str(data_path)]
        self.point_cap = point_cap

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        if self.ext == ".bin":
            pts = np.fromfile(self.files[i], np.float32).reshape(-1, 6)
        elif self.ext == ".npy":
            pts = np.load(self.files[i]).astype(np.float32)[:, :6]
        else:
            raise NotImplementedError(self.ext)
        return pts

    def batch(self, i):
        pts = self[i]
        P = self.point_cap
        out = np.zeros((1, P, 6), np.float32)
        valid = np.zeros((1, P), bool)
        n = min(len(pts), P)
        out[0, :n] = pts[:n]
        valid[0, :n] = True
        return dict(points=out, points_valid=valid)


def main():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ext", type=str, default=".bin")
    parser.add_argument("--out_file", type=str, default=None)
    parser.add_argument("--render_dir", type=str, default=None,
                        help="write a headless PNG per scene "
                             "(visual_utils.headless_vis_utils)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from cagroup3d_tpu.config import cfg, cfg_from_yaml_file
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.parallel import make_eval_step
    from cagroup3d_tpu.training.checkpoint import load_checkpoint
    from cagroup3d_tpu.utils.common_utils import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = create_logger()
    demo = DemoDataset(args.data_path, args.ext)
    logger.info(f"Total number of samples: {len(demo)}")

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=None)
    if args.ckpt:
        ck = load_checkpoint(args.ckpt)
        params, state = ck["params"], ck["state"]
    else:
        logger.warning("no --ckpt given; using random init")
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)

    results = []
    for i in range(len(demo)):
        batch = {k: jnp.asarray(v) for k, v in demo.batch(i).items()}
        preds = eval_step(params, state, batch, jnp.float32(1000.0))
        v = np.asarray(preds["pred_valid"])[0]
        boxes = np.asarray(preds["pred_boxes"])[0][v]
        scores = np.asarray(preds["pred_scores"])[0][v]
        labels = np.asarray(preds["pred_labels"])[0][v]
        logger.info(f"sample {i}: {len(boxes)} detections")
        for b, s, l in zip(boxes[:10], scores[:10], labels[:10]):
            logger.info(f"  {cfg.CLASS_NAMES[int(l)]:>14} score={s:.3f} "
                        f"box={np.round(b, 2).tolist()}")
        results.append(dict(boxes=boxes, scores=scores, labels=labels,
                            file=demo.files[i]))
        if args.render_dir:
            from visual_utils.headless_vis_utils import draw_scenes
            pts = demo[i]
            png = draw_scenes(
                pts, ref_boxes=boxes, ref_labels=labels,
                ref_scores=scores,
                save_path=Path(args.render_dir) /
                (Path(demo.files[i]).stem + ".png"),
                title=Path(demo.files[i]).name)
            logger.info(f"  rendered {png}")
    if args.out_file:
        with open(args.out_file, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"wrote {args.out_file}")
    logger.info("Demo done.")


if __name__ == "__main__":
    main()
