"""Checkpoint converter: fabricate a reference-style torch state_dict and
check key-for-key conversion to our flat params/state."""
import sys
from pathlib import Path

import numpy as np
import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_reference_ckpt import (convert_kernel, convert_state_dict,
                                    me_to_ours_perm)


def fabricate_reference_sd(P0, S0, n_classes):
    """Invert our flat keys into reference torch state_dict names/shapes."""
    bn_paths = {k[: -len(".running_mean")] for k in S0
                if k.endswith(".running_mean")}
    sd = {}

    def is_stacked(k):
        return ".cls_individual_" in k or k.endswith("scales.scale")

    for k, v in list(P0.items()) + list(S0.items()):
        v = np.asarray(v)
        base = k.rsplit(".", 1)[0]
        leaf = k.rsplit(".", 1)[1]
        if is_stacked(k):
            # per-class ModuleList entries
            if k.endswith("scales.scale"):
                for i in range(n_classes):
                    sd[f"{base}.{i}.scale"] = v[i]
                continue
            # k like dense_head.cls_individual_out.0.kernel (stacked)
            parts = k.split(".")
            mod = ".".join(parts[:2])            # dense_head.cls_individual_x
            rest = ".".join(parts[2:])
            for i in range(n_classes):
                name = f"{mod}.{i}.{rest}"
                arr = v[i]
                if rest.endswith("kernel"):
                    kk = round(arr.shape[0] ** (1 / 3))
                    if arr.shape[0] == 1:
                        arr = arr[0]
                    else:
                        inv = np.argsort(me_to_ours_perm(kk))
                        arr = arr[inv]
                else:
                    # BN inside the per-class block
                    name = _insert_bn(name, rest)
                sd[name] = arr
            continue
        if leaf == "kernel":
            if v.shape[0] == 1:
                sd[k] = v[0]
            else:
                kk = round(v.shape[0] ** (1 / 3))
                inv = np.argsort(me_to_ours_perm(kk))
                sd[k] = v[inv]
        elif base in bn_paths and ("reg_fc_layers" not in k):
            # ME BatchNorm stores under .bn.
            sd[f"{base}.bn.{leaf}"] = v
            if leaf == "running_var":
                sd[f"{base}.bn.num_batches_tracked"] = np.int64(7)
        elif leaf == "weight" and v.ndim == 2:
            sd[k] = v.T  # torch Linear (out, in)
        else:
            sd[k] = v
    return sd


def _insert_bn(name, rest):
    # ME BN keys end with .weight/.bias/.running_*; insert .bn before leaf
    head, leaf = name.rsplit(".", 1)
    return f"{head}.bn.{leaf}"


def test_roundtrip_keys_and_values():
    from cagroup3d_tpu.config import EasyDict
    sys.path.insert(0, "tests")
    from test_detector import tiny_cfg
    from cagroup3d_tpu.models import build_network

    cfg = tiny_cfg(n_classes=4)
    model = build_network(cfg, num_class=4)
    P0, S0 = model.init(jax.random.PRNGKey(0))
    sd = fabricate_reference_sd(P0, S0, n_classes=4)
    params, state = convert_state_dict(sd, n_classes=4)

    assert set(params) == set(P0), (
        sorted(set(P0) - set(params))[:5], sorted(set(params) - set(P0))[:5])
    assert set(state) == set(S0)
    for k in P0:
        assert params[k].shape == tuple(np.asarray(P0[k]).shape), k
        np.testing.assert_allclose(params[k], np.asarray(P0[k]), atol=1e-6,
                                   err_msg=k)
    for k in S0:
        np.testing.assert_allclose(state[k], np.asarray(S0[k]), atol=1e-6)


def test_kernel_perm_inverse():
    k = 3
    perm = me_to_ours_perm(k)
    # digit-reversal is an involution on (x, y, z) -> (z, y, x)
    assert (perm[perm] == np.arange(27)).all()
    a = np.arange(27 * 2 * 3).reshape(27, 2, 3).astype(np.float32)
    b = convert_kernel(a)
    # offset (1,0,0) in me order (x fastest) is me index 1 -> ours index 9
    assert (b[9] == a[1]).all()
