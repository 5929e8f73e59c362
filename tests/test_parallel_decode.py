"""Parallel-decode eval mode: vmapped timesteps equal the serial scan when
timesteps are independent (no canvas feedback)."""

import numpy as np
import jax
import jax.numpy as jnp

from rec_attend_tpu import config
from rec_attend_tpu.models import full_model


def _batch(rng, T):
  b = {
      'x': jnp.array(rng.rand(2, 64, 64, 3).astype(np.float32)),
      'y_gt': jnp.array((rng.rand(2, T, 64, 64) > 0.8).astype(np.float32)),
      's_gt': jnp.ones((2, T), jnp.float32),
  }
  return b


def test_parallel_matches_serial_when_independent():
  rng = np.random.RandomState(0)
  key = jax.random.PRNGKey(0)
  base = dict(ctrl_add_inp=True, ctrl_add_canvas=False,
              attn_add_inp=True, attn_add_canvas=False,
              disable_overwrite=False, use_knob=False)
  cfg_serial = config.tiny_full_config(parallel_decode=False, **base)
  cfg_par = config.tiny_full_config(parallel_decode=None, **base)
  # Input depth excludes the canvas channel in this mode.
  params = full_model.init_full_model(key, cfg_serial)
  batch = _batch(rng, cfg_serial.timespan)
  out_s, _ = full_model.full_model_forward(params, batch, cfg_serial,
                                           train=False, key=key)
  out_p, _ = full_model.full_model_forward(params, batch, cfg_par,
                                           train=False, key=key)
  np.testing.assert_allclose(np.asarray(out_p['y_out']),
                             np.asarray(out_s['y_out']), rtol=1e-4,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(out_p['s_out']),
                             np.asarray(out_s['s_out']), rtol=1e-4,
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(out_p['canvas']),
                             np.asarray(out_s['canvas']), rtol=1e-4,
                             atol=1e-5)


def test_auto_detect_stays_serial_with_canvas():
  """Default configs (canvas feedback on) must keep the serial scan —
  outputs depend on decode order."""
  rng = np.random.RandomState(1)
  key = jax.random.PRNGKey(0)
  cfg = config.tiny_full_config(use_knob=False)
  flags = cfg.resolved_input_flags()
  assert flags['ctrl_add_canvas'] and flags['attn_add_canvas']
  params = full_model.init_full_model(key, cfg)
  batch = _batch(rng, cfg.timespan)
  # Just verify it runs (auto-detect keeps scan; no assertion on internals
  # beyond determinism).
  out1, _ = full_model.full_model_forward(params, batch, cfg, False, key)
  out2, _ = full_model.full_model_forward(params, batch, cfg, False, key)
  np.testing.assert_allclose(np.asarray(out1['y_out']),
                             np.asarray(out2['y_out']))
