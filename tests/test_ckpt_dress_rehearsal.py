"""Checkpoint-conversion dress rehearsal: a REAL torch .pth in the exact
reference format (key names + ME storage conventions enumerated
independently from the reference source in reference_sd_spec.py), pushed
through the actual tools/convert_reference_ckpt.py CLI with --strict,
then eval-forwarded through the full-channel model.

This is the strongest parity check available without the real dataset:
if any reference key stops mapping (name, shape, or convention like ME's
(1, Cout) conv bias), --strict fails; if the converted weights are
structurally broken, the forward produces non-finite scores.
"""
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))

from reference_sd_spec import cagroup3d_reference_sd  # noqa: E402


def _cpu_env():
    """Subprocess env forcing the CPU backend (the axon sitecustomize
    would otherwise dial the TPU tunnel; see .claude/skills/verify)."""
    import os
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.parametrize("dataset", ["scannet", "sunrgbd"])
def test_convert_cli_strict(dataset, tmp_path):
    torch = pytest.importorskip("torch")
    sd = cagroup3d_reference_sd(dataset)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    src = tmp_path / f"ref_{dataset}.pth"
    dst = tmp_path / f"out_{dataset}.pkl"
    # reference checkpoint_state format (tools/train_utils/train_utils.py)
    torch.save({"model_state": tsd, "epoch": 12, "it": 3456,
                "version": "pcdet+0.5.2"}, str(src))

    cfg = REPO / "tools" / "cfgs" / f"{dataset}_models" / "CAGroup3D.yaml"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_reference_ckpt.py"),
         "--src", str(src), "--dst", str(dst), "--cfg_file", str(cfg),
         "--strict"],
        capture_output=True, text=True, timeout=600,
        env=_cpu_env())
    assert r.returncode == 0, f"STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}"
    with open(dst, "rb") as f:
        out = pickle.load(f)
    assert out["epoch"] == 12 and out["it"] == 3456
    # spot-check value mapping: a 1x1 conv passes through as (1, Cin, Co)
    np.testing.assert_allclose(
        out["params"]["dense_head.semantic_conv.kernel"][0],
        sd["dense_head.semantic_conv.kernel"], atol=0)
    # ME (1, Cout) bias flattened
    assert out["params"]["dense_head.semantic_conv.bias"].ndim == 1
    # torch Linear (out, in) transposed
    w = sd["roi_head.reg_pred_layer.weight"]
    np.testing.assert_allclose(
        out["params"]["roi_head.reg_pred_layer.weight"], w.T, atol=0)
    # per-class stacking: class 3's k9 kernel row count
    k = out["params"]["dense_head.cls_individual_out.0.kernel"]
    assert k.shape[0] == (18 if dataset == "scannet" else 10)
    assert k.shape[1] == 729


def test_ddp_module_prefix_stripped():
    from convert_reference_ckpt import convert_state_dict
    sd = cagroup3d_reference_sd("scannet")
    plain, _ = convert_state_dict(sd, n_classes=18)
    wrapped, _ = convert_state_dict(
        {f"module.{k}": v for k, v in sd.items()}, n_classes=18)
    assert set(plain) == set(wrapped)


def test_converted_weights_forward(tmp_path):
    """Eval-forward the converted reference weights through the
    full-channel ScanNet model (capacity knobs shrunk; channel shapes
    untouched so the checkpoint must actually fit)."""
    import jax
    import yaml
    from cagroup3d_tpu.config import EasyDict
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.utils.synthetic import synthetic_batch
    from convert_reference_ckpt import convert_state_dict

    sd = cagroup3d_reference_sd("scannet")
    params, state = convert_state_dict(sd, n_classes=18)

    with open(REPO / "tools/cfgs/scannet_models/CAGroup3D.yaml") as f:
        cfg = EasyDict(yaml.safe_load(f))
    m = cfg.MODEL
    m.BACKBONE_3D.CAPS = {1: 2048, 2: 2048, 4: 1024, 8: 512, 16: 256,
                          32: 128, 64: 32, 128: 16, 256: 16, 512: 16}
    m.INPUT_CAP = 2048
    m.DENSE_HEAD.FINE_CAP = 512
    m.DENSE_HEAD.EXPAND_CAP = 512
    m.DENSE_HEAD.MAX_ROIS = 32
    m.DENSE_HEAD.NMS_PER_CLS_CAP = 16
    m.DENSE_HEAD.NMS_CONFIG.NMS_PRE = 64
    m.ROI_HEAD.GRID_CAP = 1024
    m.ROI_HEAD.MAX_OUT = 32
    m.ROI_HEAD.NMS_PER_CLS_CAP = 16
    model = build_network(m, num_class=18)

    P0, S0 = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    assert set(P0) == set(params)
    assert set(S0) == set(state)
    for k in P0:
        assert tuple(P0[k].shape) == tuple(params[k].shape), k

    import jax.numpy as jnp
    P = {k: jnp.asarray(v) for k, v in params.items()}
    S = {k: jnp.asarray(v) for k, v in state.items()}
    rng = np.random.RandomState(0)
    b = synthetic_batch(rng, batch_size=1, n_points=3000, point_cap=3072)
    batch = {k: jnp.asarray(b[k]) for k in ("points", "points_valid")}
    out = jax.jit(lambda P, S, batch: model.forward_eval(
        P, S, batch, cur_epoch=10))(P, S, batch)
    assert np.isfinite(np.asarray(out["pred_scores"])).all()
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
