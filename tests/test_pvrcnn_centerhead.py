"""PV-RCNN with a CenterHead RPN (reference tools/cfgs/waymo_models/
pv_rcnn_with_centerhead_rpn.yaml): the CenterHead's pre-NMS peak decode
feeds the head-agnostic RoI proposal layer via decoded_boxes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.models import build_network
from test_centerpoint import centerpoint_cfg
from test_outdoor import outdoor_batch
from test_pvrcnn import pvrcnn_cfg


def pvrcnn_centerhead_cfg():
    c = pvrcnn_cfg()
    c.DENSE_HEAD = centerpoint_cfg().DENSE_HEAD
    return c


@pytest.fixture(scope="module")
def model_and_params():
    cfg = pvrcnn_centerhead_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_pvrcnn_centerhead_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=2, P=512)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["rcnn_loss_reg"]) > 0
    for key in ("dense_head.heads.0.hm.out.weight",
                "dense_head.heads.0.rot.out.weight",
                "pfe.vsa_point_feature_fusion.weight",
                "roi_head.reg_layers.out.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_pvrcnn_centerhead_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1, P=512)
    out = jax.jit(model.forward_eval)(P, S, batch)
    assert out["pred_boxes"].shape[0] == 1
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
