"""checkify nan-guard (SURVEY §5 debugging hooks): with
CAGROUP_NAN_GUARD / nan_guard=True the train step raises on the first
non-finite intermediate; clean steps pass.

Uses a stub model: checkify float-checks instrument EVERY op, so a full
detector's instrumented CPU compile takes tens of minutes — the guard
mechanism in parallel/mesh.py is model-agnostic (it wraps
model.forward_train), which a stub exercises completely."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cagroup3d_tpu.parallel import make_train_step

pytestmark = pytest.mark.quick


class StubModel:
    """Minimal forward_train contract: (P, S, batch, rng, cur_epoch) ->
    (loss, tb, state_updates)."""

    def forward_train(self, P, S, batch, rng, cur_epoch):
        h = jnp.tanh(batch["x"] @ P["w"])
        # log of a shifted value: a poisoned (nan) weight propagates, and
        # checkify flags the first non-finite op with a source location
        loss = jnp.mean(jnp.log1p(h ** 2)) + 0.0 * cur_epoch
        return loss, {"loss": loss}, {"ema": S["ema"] * 0.9 + loss * 0.1}


@pytest.fixture()
def setup():
    model = StubModel()
    P = {"w": jnp.ones((8, 4), jnp.float32) * 0.3}
    S = {"ema": jnp.float32(0.0)}
    tx = optax.adam(1e-3)
    batch = {"x": jnp.asarray(np.random.RandomState(0)
                              .randn(16, 8), jnp.float32)}
    return model, P, S, tx, batch


def test_clean_step_passes(setup):
    model, P, S, tx, batch = setup
    step = make_train_step(model, tx, nan_guard=True)
    P2, S2, opt2, loss, tb = step(P, S, tx.init(P), batch,
                                  jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(loss))


def test_poisoned_params_raise(setup):
    model, P, S, tx, batch = setup
    bad = {"w": P["w"].at[0, 0].set(jnp.nan)}
    step = make_train_step(model, tx, nan_guard=True)
    with pytest.raises(Exception, match="(?i)nan|inf"):
        step(bad, S, tx.init(bad), batch, jax.random.PRNGKey(1), 0.0)


def test_env_var_enables_guard(setup, monkeypatch):
    monkeypatch.setenv("CAGROUP_NAN_GUARD", "1")
    model, P, S, tx, batch = setup
    bad = {"w": P["w"].at[0, 0].set(jnp.nan)}
    step = make_train_step(model, tx)
    with pytest.raises(Exception, match="(?i)nan|inf"):
        step(bad, S, tx.init(bad), batch, jax.random.PRNGKey(1), 0.0)


def test_guard_off_by_default(setup, monkeypatch):
    monkeypatch.delenv("CAGROUP_NAN_GUARD", raising=False)
    model, P, S, tx, batch = setup
    bad = {"w": P["w"].at[0, 0].set(jnp.nan)}
    step = make_train_step(model, tx, donate=False)
    # un-guarded step silently produces a non-finite loss (what the
    # guard exists to catch loudly)
    out = step(bad, S, tx.init(bad), batch, jax.random.PRNGKey(1), 0.0)
    assert not np.isfinite(float(out[3]))