"""Convert a reference CAGroup3D torch checkpoint (.pth) to this
framework's flat param/state dicts.

The reference stores ME kernels as (K^3, Cin, Cout) (kernel_size=1 convs
as (Cin, Cout)), MinkowskiBatchNorm under a ``.bn.`` prefix, torch Linear
as (out, in), and per-class head modules as indexed ModuleLists
(reference Detector3DTemplate._load_state_dict, cagroup_head._init_layers).
We keep the same key paths, so conversion is:
  * strip ``.bn.`` from batch-norm keys, drop num_batches_tracked
  * reshape k=1 conv kernels to (1, Cin, Cout)
  * permute kernel offsets from ME's enumeration (first axis fastest) to
    ours (itertools.product: last axis fastest) — a pure digit-reversal
    permutation of the K^3 axis
  * transpose Linear weights
  * stack per-class ModuleList entries (cls_individual_*, scales) along a
    leading class axis

Usage:
  python tools/convert_reference_ckpt.py --src ref.pth --dst out.pkl \
      --cfg_file tools/cfgs/scannet_models/CAGroup3D.yaml
"""
import argparse
import pickle
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def me_to_ours_perm(k: int) -> np.ndarray:
    """Permutation p with ours[j] = me[p[j]] over the K^3 kernel axis.

    ME 0.5.x enumerates kernel offsets with the FIRST spatial axis varying
    fastest (kernel_region.hpp coordinate_at iterates axis 0 innermost);
    our kernel_offsets (core/kernel_maps.py) is z-fastest.  The mapping is
    pinned by tests/test_me_semantics.py: an independent numpy oracle in
    ME convention, converted through this permutation, matches the engine
    bit-for-bit on subm/strided/generative-transpose convs."""
    idx = np.arange(k ** 3)
    # ours index j = x*k^2 + y*k + z (z fastest); the same offset in ME
    # enumeration (x fastest) sits at index x + y*k + z*k^2
    x = idx // (k * k)
    y = (idx // k) % k
    z = idx % k
    return x + k * y + k * k * z


def convert_kernel(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:  # kernel_size == 1
        return arr[None, :, :]
    k3 = arr.shape[0]
    k = round(k3 ** (1 / 3))
    assert k ** 3 == k3, f"non-cubic kernel {arr.shape}"
    return arr[me_to_ours_perm(k)]


def convert_state_dict(sd, n_classes: int):
    """torch state_dict {name: np array} -> (params, state) flat dicts."""
    params, state = {}, {}
    percls = {}
    for name, val in sd.items():
        val = np.asarray(val, dtype=np.float32)
        if name.endswith("num_batches_tracked"):
            continue
        if name.startswith("module."):   # DDP-wrapped save
            name = name[len("module."):]
        name = name.replace(".bn.", ".")
        # ME 0.5.x stores MinkowskiConvolution bias as (1, Cout)
        # (MinkowskiConvolutionBase); ours is flat (Cout,)
        if name.endswith(".bias") and val.ndim == 2 and val.shape[0] == 1:
            val = val.reshape(-1)
        # per-class ModuleLists -> collect, stack later
        m = re.match(
            r"(.*\.(?:cls_individual_\w+|scales))\.(\d+)\.(.*)", name)
        if m:
            base, cls_id, rest = m.group(1), int(m.group(2)), m.group(3)
            percls.setdefault((base, rest), {})[cls_id] = val
            continue
        _store(params, state, name, val)

    for (base, rest), by_cls in percls.items():
        arrs = [by_cls[i] for i in range(n_classes)]
        if rest.endswith("kernel"):
            arrs = [convert_kernel(a) for a in arrs]
            _put(params, state, f"{base}.{rest}", np.stack(arrs))
        elif rest == "scale":
            _put(params, state, f"{base}.scale",
                 np.stack([a.reshape(()) for a in arrs]))
        else:
            _put(params, state, f"{base}.{rest}", np.stack(arrs))
    # kernel conversion + linear transpose for non-stacked entries
    out_p = {}
    for k, v in params.items():
        if k.endswith(".kernel") and "cls_individual" not in k:
            v = convert_kernel(v)
        elif re.search(r"(reg_fc_layers\.\d+|reg_pred_layer)\.weight$", k) \
                and v.ndim == 2:
            v = v.T
        out_p[k] = v
    return out_p, state


def _is_state(name):
    return name.endswith("running_mean") or name.endswith("running_var")


def _store(params, state, name, val):
    (state if _is_state(name) else params)[name] = val


def _put(params, state, name, val):
    (state if _is_state(name) else params)[name] = val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--strict", action="store_true",
                    help="exit non-zero on any missing/unexpected/"
                         "shape-mismatched key")
    args = ap.parse_args()

    import torch
    from cagroup3d_tpu.config import EasyDict, cfg_from_yaml_file
    from cagroup3d_tpu.models import build_network

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}

    c = EasyDict()
    cfg_from_yaml_file(args.cfg_file, c)
    n_classes = len(c.CLASS_NAMES)
    params, state = convert_state_dict(sd, n_classes)

    # validate against a freshly initialized model: same keys, same shapes
    # (eval_shape: no compute, just the param tree structure)
    import jax
    model = build_network(c.MODEL, num_class=n_classes)
    P0, S0 = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    problems = 0
    for label, ours, got in (("param", P0, params), ("state", S0, state)):
        missing = sorted(set(ours) - set(got))
        unexpected = sorted(set(got) - set(ours))
        mismatched = [k for k in sorted(set(ours) & set(got))
                      if tuple(ours[k].shape) != tuple(got[k].shape)]
        for k in mismatched:
            print(f"SHAPE MISMATCH {label} {k}: ours {ours[k].shape} "
                  f"ref {got[k].shape}")
        if missing:
            print(f"missing {label}s ({len(missing)}):", missing[:20])
        if unexpected:
            print(f"unexpected {label}s ({len(unexpected)}):",
                  unexpected[:20])
        problems += len(missing) + len(unexpected) + len(mismatched)
    if args.strict and problems:
        print(f"STRICT: {problems} problems")
        sys.exit(1)

    with open(args.dst, "wb") as f:
        pickle.dump(dict(params=params, state=state,
                         epoch=ckpt.get("epoch", 0), it=ckpt.get("it", 0),
                         version="converted+" + str(ckpt.get("version"))),
                    f, protocol=4)
    print(f"wrote {args.dst}: {len(params)} params, {len(state)} state")


if __name__ == "__main__":
    main()
