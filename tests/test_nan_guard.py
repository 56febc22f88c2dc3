"""checkify nan-guard (SURVEY §5 debugging hooks): with
CAGROUP_NAN_GUARD / nan_guard=True the train step raises with a source
location on the first non-finite intermediate; clean steps pass."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cagroup3d_tpu.models import build_network
from cagroup3d_tpu.parallel import make_train_step
from test_centerpoint import centerpoint_cfg
from test_outdoor import outdoor_batch


@pytest.fixture(scope="module")
def setup():
    model = build_network(centerpoint_cfg(), num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    rng = np.random.RandomState(0)
    batch = outdoor_batch(rng, B=2, P=512)
    return model, P, S, tx, batch


def test_clean_step_passes(setup):
    model, P, S, tx, batch = setup
    step = make_train_step(model, tx, nan_guard=True)
    P2, S2, opt2, loss, tb = step(P, S, tx.init(P), batch,
                                  jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(loss))


def test_poisoned_params_raise(setup):
    model, P, S, tx, batch = setup
    bad = dict(P)
    k = next(iter(k for k in bad if bad[k].ndim >= 2))
    bad[k] = bad[k].at[..., 0].set(jnp.nan)
    step = make_train_step(model, tx, nan_guard=True)
    with pytest.raises(Exception, match="(?i)nan|inf"):
        step(bad, S, tx.init(bad), batch, jax.random.PRNGKey(1), 0.0)


def test_guard_off_by_default(setup, monkeypatch):
    monkeypatch.delenv("CAGROUP_NAN_GUARD", raising=False)
    model, P, S, tx, batch = setup
    step = make_train_step(model, tx, donate=False)
    # un-guarded step silently produces a non-finite loss (what the guard
    # exists to catch loudly)
    bad = dict(P)
    k = next(iter(k for k in bad if bad[k].ndim >= 2))
    bad[k] = bad[k].at[..., 0].set(jnp.nan)
    out = step(bad, S, tx.init(bad), batch, jax.random.PRNGKey(1), 0.0)
    assert not np.isfinite(float(out[3]))
