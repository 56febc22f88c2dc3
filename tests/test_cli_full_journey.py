"""Full user-journey rehearsal through the REAL CLIs on a ScanNet-schema
dataset tree: tools/train.py (one epoch, checkpoint written) ->
tools/test.py (eval, printed mAP, result.pkl) — the exact workflow the
README advertises (reference: tools/train.py + tools/test.py usage,
README.md:81-116).

Uses a derived yaml with _BASE_CONFIG_ pointing at the shipped ScanNet
CAGroup3D.yaml (exercising config inheritance) plus tiny-capacity
overrides; the data tree is the mmdet3d pkl/bin schema from
test_datasets_eval.make_scannet_tree (reference
pcdet/datasets/scannet/scannet_dataset.py:62-84).
"""
import os
import pickle
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))

from test_datasets_eval import make_scannet_tree  # noqa: E402

TINY_OVERRIDES = """
_BASE_CONFIG_: {base}
DATA_CONFIG:
    DATA_PATH: {data}
    POINT_CAP: 4096
    MAX_GT: 16
MODEL:
    INPUT_CAP: 1024
    INS_CAP: 16
    BACKBONE_3D:
        CAPS: {{1: 1024, 2: 1024, 4: 1024, 8: 512, 16: 128, 32: 64,
               64: 16, 128: 8, 256: 8, 512: 8}}
        PLANES: 16
        SPP_PLANES: 16
        OUT_CHANNELS: 16
    DENSE_HEAD:
        OUT_CHANNELS: 16
        CLS_KERNEL: 3
        FINE_CAP: 1024
        EXPAND_CAP: 1024
        MAX_ROIS: 32
        NMS_PER_CLS_CAP: 32
        NMS_CONFIG:
            NMS_PRE: 64
    ROI_HEAD:
        MLPS: [[16, 32, 32]]
        REG_FC: [32, 32]
        GRID_CAP: 1024
        ROI_PER_IMAGE: 16
        NMS_PER_CLS_CAP: 16
        MAX_OUT: 32
OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
"""


def _env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # share the repo test cache so repeated runs skip XLA recompiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   str(REPO / ".xla_cache_tests"))
    return env


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    root = make_scannet_tree(tmp_path)
    cfgdir = tmp_path / "cfgs" / "scannet_models"
    cfgdir.mkdir(parents=True)
    cfg = cfgdir / "CAGroup3D_tiny.yaml"
    cfg.write_text(TINY_OVERRIDES.format(
        base=REPO / "tools/cfgs/scannet_models/CAGroup3D.yaml", data=root))

    # ---- train: 3 scenes x REPEAT 10 / B=2 = 15 steps, 1 epoch ----
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "train.py"),
         "--cfg_file", str(cfg), "--fix_random_seed", "--workers", "0"],
        capture_output=True, text=True, timeout=1500, cwd=tmp_path,
        env=_env())
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-4000:]}\n" \
                              f"STDERR:\n{r.stderr[-4000:]}"
    # EXP_GROUP_PATH is derived from the cfg_file path (train.py:46), so
    # with an absolute cfg the output tree nests deeply — search it
    out_root = tmp_path / "output"
    ckpts = sorted(out_root.rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, (r.stdout[-2000:], list(out_root.rglob("*"))[:20])
    assert list(out_root.rglob("metrics.jsonl"))

    # ---- eval: the trained checkpoint through test.py ----
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "test.py"),
         "--cfg_file", str(cfg), "--ckpt", str(ckpts[-1]),
         "--batch_size", "1"],
        capture_output=True, text=True, timeout=1500, cwd=tmp_path,
        env=_env())
    assert r.returncode == 0, f"STDOUT:\n{r.stdout[-4000:]}\n" \
                              f"STDERR:\n{r.stderr[-4000:]}"
    text = r.stdout + r.stderr
    # the indoor evaluator's printed mAP line (indoor_eval.py:270)
    m = re.search(r"mAP_0\.25=([0-9.]+)", text)
    assert m, text[-4000:]
    assert 0.0 <= float(m.group(1)) <= 1.0
    results = list((tmp_path / "output").rglob("result.pkl"))
    assert results
    with open(results[0], "rb") as f:
        dets = pickle.load(f)
    assert len(dets) == 3  # one prediction dict per val scene
