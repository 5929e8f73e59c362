"""Multi-device tests on the 8-way virtual CPU mesh: DP/TP sharded training
steps match single-device results and the driver dryrun path works."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rec_attend_tpu import config
from rec_attend_tpu.models import full_model
from rec_attend_tpu.parallel import mesh as mesh_lib
from rec_attend_tpu.parallel import train_step as ts_lib


@pytest.fixture(scope='module')
def tiny():
  cfg = config.tiny_full_config(use_knob=False)
  key = jax.random.PRNGKey(0)
  params = full_model.init_full_model(key, cfg)
  rng = np.random.RandomState(0)
  B, T, H, W = 8, cfg.timespan, 64, 64
  x = rng.rand(B, H, W, 3).astype(np.float32)
  y = np.zeros((B, T, H, W), np.float32)
  s = np.zeros((B, T), np.float32)
  for b in range(B):
    y[b, 0, 10:30, 10:30] = 1.0
    s[b, 0] = 1.0
  batch = {'x': jnp.array(x), 'y_gt': jnp.array(y), 's_gt': jnp.array(s)}
  return cfg, params, batch


def test_mesh_construction():
  assert len(jax.devices()) == 8, 'conftest must fake 8 devices'
  mesh = mesh_lib.make_mesh()
  assert mesh.shape == {'data': 8, 'model': 1}
  mesh2 = mesh_lib.make_mesh(num_data=4, num_model=2)
  assert mesh2.shape == {'data': 4, 'model': 2}


def test_dp_train_step_matches_single_device(tiny):
  cfg, params, batch = tiny
  key = jax.random.PRNGKey(7)
  step = jnp.asarray(0.0)

  single_fn, tx = ts_lib.make_train_step(full_model.full_model_loss, cfg,
                                         mesh=None, donate=False)
  p1, o1, m1 = single_fn(params, tx.init(params), batch, key, step)

  mesh = mesh_lib.make_mesh(num_data=8)
  dp_fn, tx2 = ts_lib.make_train_step(full_model.full_model_loss, cfg,
                                      mesh=mesh, donate=False)
  sp = mesh_lib.replicate(mesh, params)
  so = mesh_lib.replicate(mesh, tx2.init(params))
  sb = mesh_lib.shard_batch(mesh, batch)
  p2, o2, m2 = dp_fn(sp, so, sb,
                     mesh_lib.replicate(mesh, key),
                     mesh_lib.replicate(mesh, step))
  # Same loss and same updated params (DP is numerically the same batch).
  np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                             rtol=2e-4, atol=2e-5)
  w1 = np.asarray(p1['ctrl_mlp'][0]['w'])
  w2 = np.asarray(p2['ctrl_mlp'][0]['w'])
  np.testing.assert_allclose(w1, w2, rtol=2e-3, atol=2e-4)


def test_tp_loss_and_grads_match_dp_only(tiny):
  """4x2 DP x TP (weights split on output dims + in-model activation
  constraints) must numerically match the 8x1 pure-DP loss AND gradients.
  (Gradients, not Adam-updated params: at step 0 Adam emits +-lr by
  gradient sign, which amplifies reduction-order noise on ~0 grads.)"""
  cfg, params, batch = tiny
  key = jax.random.PRNGKey(3)

  from jax.sharding import NamedSharding, PartitionSpec as P

  def lg(params, batch):
    loss, _ = full_model.full_model_loss(params, batch, cfg, True, key,
                                         jnp.asarray(0.0))
    return loss

  def run(mesh, shard_model):
    psh = mesh_lib.param_sharding_rules(params, mesh,
                                        shard_model_axis=shard_model)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P('data'))
    with mesh_lib.tensor_parallel(mesh):
      jfn = jax.jit(jax.value_and_grad(lg),
                    in_shardings=(psh, bsh), out_shardings=(repl, psh))
      p = jax.device_put(params, psh)
      b = {k: jax.device_put(v, bsh) for k, v in batch.items()}
      loss, grads = jfn(p, b)
      return float(loss), jax.device_get(grads)

  loss_dp, g_dp = run(mesh_lib.make_mesh(num_data=8, num_model=1), False)
  loss_tp, g_tp = run(mesh_lib.make_mesh(num_data=4, num_model=2), True)
  np.testing.assert_allclose(loss_dp, loss_tp, rtol=2e-4, atol=2e-5)
  for a, b in zip(jax.tree_util.tree_leaves(g_dp),
                  jax.tree_util.tree_leaves(g_tp)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-5)


def test_eval_step_sharded(tiny):
  cfg, params, batch = tiny
  mesh = mesh_lib.make_mesh(num_data=8)
  ev = ts_lib.make_eval_step(full_model.full_model_loss, cfg, mesh=mesh)
  metrics = ev(mesh_lib.replicate(mesh, params),
               mesh_lib.shard_batch(mesh, batch),
               mesh_lib.replicate(mesh, jax.random.PRNGKey(0)))
  assert np.isfinite(float(metrics['loss']))


def test_dryrun_multichip_entrypoint():
  import __graft_entry__ as ge
  ge.dryrun_multichip(8)


def test_entry_compiles():
  import __graft_entry__ as ge
  fn, args = ge.entry()
  y, s = jax.jit(fn)(*args)
  assert np.isfinite(np.asarray(y)).all()


def test_pipeline_parallel_fg_matches_reference():
  """2-stage PP (encoder on device 0, decoder on device 1) over 2
  microbatches must equal the single-device FG forward."""
  from rec_attend_tpu.models import fg_model
  from rec_attend_tpu.parallel import pp

  cfg = config.tiny_fg_config()
  rng = np.random.RandomState(0)
  batch = {'x': jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))}
  params = fg_model.init_fg_model(jax.random.PRNGKey(0), cfg)
  ref_out, _ = fg_model.fg_model_forward(
      params, dict(batch, y_gt=jnp.zeros((4, 64, 64, 1))), cfg, False,
      jax.random.PRNGKey(1))
  pp_out = pp.fg_pipeline_forward(params, batch, cfg, num_microbatches=2)
  np.testing.assert_allclose(np.asarray(pp_out['y_out']),
                             np.asarray(ref_out['y_out']),
                             rtol=1e-5, atol=1e-6)
  # Boundary really crossed devices: stage outputs live on device 1.
  assert pp_out['y_out'].devices() == {jax.devices()[1]}


def test_pipeline_parallel_full_matches_reference():
  """Full-model 2-stage PP (controller on device 0, glimpse decoder on
  device 1) over 2 microbatches equals the single-device forward in the
  canvas-free (parallel-decode) eval configuration."""
  from rec_attend_tpu.parallel import pp

  cfg = config.tiny_full_config(
      ctrl_add_inp=True, ctrl_add_canvas=False,
      attn_add_inp=True, attn_add_canvas=False,
      disable_overwrite=False, use_knob=False)
  rng = np.random.RandomState(0)
  T = cfg.timespan
  batch = {
      'x': jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32)),
      'y_gt': jnp.asarray((rng.rand(4, T, 64, 64) > 0.8).astype(np.float32)),
      's_gt': jnp.ones((4, T), jnp.float32),
  }
  params = full_model.init_full_model(jax.random.PRNGKey(0), cfg)
  ref_out, _ = full_model.full_model_forward(params, batch, cfg, False,
                                             jax.random.PRNGKey(1))
  pp_out = pp.full_pipeline_forward(params, {'x': batch['x']}, cfg,
                                    num_microbatches=2)
  np.testing.assert_allclose(np.asarray(pp_out['y_out']),
                             np.asarray(ref_out['y_out']),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(pp_out['s_out']),
                             np.asarray(ref_out['s_out']),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(pp_out['canvas']),
                             np.asarray(ref_out['canvas']),
                             rtol=1e-4, atol=1e-5)
  assert pp_out['y_out'].devices() == {jax.devices()[1]}


def test_full_pipeline_rejects_canvas_config():
  from rec_attend_tpu.parallel import pp
  cfg = config.tiny_full_config(use_knob=False)   # canvas feedback on
  with pytest.raises(ValueError, match='canvas-free'):
    pp.full_pipeline_stages(cfg)


def test_pipeline_executor_rejects_bad_microbatching():
  from rec_attend_tpu.parallel import pp
  ex = pp.PipelineExecutor([lambda p, x: x], jax.devices()[:1])
  with pytest.raises(ValueError, match='not divisible'):
    ex.run_batched([None], {'x': jnp.zeros((5, 2))}, 2)


def test_multihost_helpers_single_process(tiny):
  """Multi-host helpers degrade to single-process: global batch assembly
  over the 8-device mesh feeds the sharded eval step."""
  from rec_attend_tpu.parallel import multihost
  cfg, params, batch = tiny
  multihost.initialize()              # no-op single process
  mesh = multihost.global_mesh()
  assert mesh.shape['data'] == 8
  lo, hi = multihost.process_batch_slice(8)
  assert (lo, hi) == (0, 8)
  host_batch = {k: np.asarray(v) for k, v in batch.items()}
  gbatch = multihost.make_global_batch(mesh, host_batch)
  assert gbatch['x'].shape[0] == 8
  ev = ts_lib.make_eval_step(full_model.full_model_loss, cfg, mesh=mesh)
  metrics = ev(mesh_lib.replicate(mesh, params), gbatch,
               mesh_lib.replicate(mesh, jax.random.PRNGKey(0)))
  assert np.isfinite(float(metrics['loss']))


def test_batch_wire_encoding_roundtrip():
  """uint8 wire encoding round-trips PNG-sourced images and binary masks
  to within 1 ULP (XLA lowers /255 to a reciprocal multiply), and decode
  passes float inputs through untouched."""
  rng = np.random.RandomState(0)
  x_u8 = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
  batch = {
      'x': x_u8.astype(np.float32) / 255.0,
      'y_gt': (rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32),
      's_gt': rng.rand(2, 3).astype(np.float32),   # not quantized
  }
  enc = ts_lib.encode_batch(batch)
  assert enc['x'].dtype == np.uint8
  assert enc['y_gt'].dtype == np.uint8
  assert enc['s_gt'].dtype == np.float32
  dec = jax.jit(ts_lib.decode_batch)(
      {k: jnp.asarray(v) for k, v in enc.items()})
  np.testing.assert_allclose(np.asarray(dec['x']), batch['x'],
                             rtol=0, atol=1e-6)
  np.testing.assert_allclose(np.asarray(dec['y_gt']), batch['y_gt'],
                             rtol=0, atol=1e-6)
  np.testing.assert_array_equal(np.asarray(dec['s_gt']), batch['s_gt'])
  # decode is idempotent on un-encoded float batches
  dec2 = jax.jit(ts_lib.decode_batch)(
      {k: jnp.asarray(v) for k, v in batch.items()})
  np.testing.assert_array_equal(np.asarray(dec2['x']), batch['x'])
