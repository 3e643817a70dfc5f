"""LR schedule semantics (``--lr_decay_schedule`` [U])."""

import numpy as np
import pytest

from wcgan_tpu.train.schedules import adam, lr_schedule


def test_none_constant():
  s = lr_schedule("none", 2e-4, 1000)
  assert float(s(0)) == pytest.approx(2e-4)
  assert float(s(999)) == pytest.approx(2e-4)


def test_linear_decays_to_zero():
  s = lr_schedule("linear", 1.0, 100)
  assert float(s(0)) == pytest.approx(1.0)
  assert float(s(50)) == pytest.approx(0.5)
  assert float(s(100)) == pytest.approx(0.0)


def test_half_linear():
  s = lr_schedule("half-linear", 1.0, 100)
  assert float(s(0)) == pytest.approx(1.0)
  assert float(s(49)) == pytest.approx(1.0)
  assert float(s(75)) == pytest.approx(0.5)
  assert float(s(100)) == pytest.approx(0.0)


def test_linear_end():
  s = lr_schedule("linear-end", 1.0, 100)
  assert float(s(89)) == pytest.approx(1.0)
  assert float(s(95)) == pytest.approx(0.5)
  assert float(s(100)) == pytest.approx(0.0)


def test_unknown_raises():
  with pytest.raises(ValueError):
    lr_schedule("cosine", 1.0, 10)


def test_adam_defaults_runnable():
  import jax.numpy as jnp
  tx = adam(2e-4, schedule="linear", total_steps=10)
  params = {"w": jnp.ones(3)}
  state = tx.init(params)
  updates, state = tx.update({"w": jnp.ones(3)}, state, params)
  assert np.isfinite(np.asarray(updates["w"])).all()
