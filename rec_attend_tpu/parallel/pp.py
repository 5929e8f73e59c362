"""Pipeline parallelism: stage-per-device microbatch execution.

No reference equivalent (single tf.Session, one GPU — SURVEY §2.8); this is
the TPU-native capability row.  Stages are jit-compiled pinned to distinct
devices; microbatches are dispatched asynchronously, so while stage ``s``
processes microbatch ``i``, stage ``s-1`` is already computing microbatch
``i+1`` — the data-dependency graph *is* the GPipe schedule, with XLA
handling the inter-device boundary transfers (ICI on a real slice).

The demo split ships for the FG model (a pure FCN, the natural pipeline
candidate): stage 0 = encoder CNN, stage 1 = decoder D-CNN + heads, with
the skip activations crossing the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class PipelineExecutor:
  """Run ``stage_fns[s]`` pinned to ``devices[s]``, microbatch-pipelined.

  Each stage fn has signature ``fn(stage_params, boundary) -> boundary``;
  the first stage receives the microbatch, the last returns the output.
  """

  def __init__(self, stage_fns, devices):
    if len(stage_fns) > len(devices):
      raise ValueError(
          f'{len(stage_fns)} stages need >= that many devices '
          f'(got {len(devices)})')
    self.devices = list(devices[:len(stage_fns)])
    self.stages = [
        jax.jit(fn, out_shardings=jax.sharding.SingleDeviceSharding(dev))
        for fn, dev in zip(stage_fns, self.devices)]

  def __call__(self, params_per_stage, microbatches):
    """Returns the list of last-stage outputs, one per microbatch.

    Dispatch is asynchronous: all microbatches are enqueued before any
    result is awaited, so stages overlap across microbatches.
    """
    placed = [jax.device_put(p, d)
              for p, d in zip(params_per_stage, self.devices)]
    outs = []
    for mb in microbatches:
      h = mb
      for fn, ps, dev in zip(self.stages, placed, self.devices):
        h = fn(ps, jax.device_put(h, dev))   # async boundary transfer
      outs.append(h)
    return outs

  def run_batched(self, params_per_stage, batch, num_microbatches):
    """Split a [B, ...] pytree batch into microbatches on the leading axis,
    pipeline them, and re-stack the outputs."""
    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    if b % num_microbatches:
      raise ValueError(f'batch {b} not divisible by {num_microbatches}')
    m = b // num_microbatches
    mbs = [jax.tree_util.tree_map(lambda a: a[i * m:(i + 1) * m], batch)
           for i in range(num_microbatches)]
    outs = self(params_per_stage, mbs)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *outs)


# ---------------------------------------------------------------------------
# FG model 2-stage split (encoder | decoder+heads)
# ---------------------------------------------------------------------------

def fg_pipeline_stages(cfg):
  """(stage0_fn, stage1_fn) for eval-mode FG inference.

  stage0: augment(eval path) + encoder CNN -> (bottleneck, skip list).
  stage1: decoder D-CNN + classification heads -> outputs dict.
  Matches ``fg_model.fg_model_forward(train=False)`` numerically."""
  from rec_attend_tpu.models.fg_model import _dcnn_skip_plan
  from rec_attend_tpu.nn import layers as nn
  from rec_attend_tpu.ops import image_ops

  n_c = len(cfg.cnn_filter_size)
  n_d = len(cfg.dcnn_filter_size)
  cnn_act = [jax.nn.relu] * n_c
  dcnn_act = [jax.nn.relu] * (n_d - 1) + [None]
  skip_src, _ = _dcnn_skip_plan(cfg)

  def stage0(params_cnn, batch):
    x = batch['x']
    aug = image_ops.random_transformation(
        jax.random.PRNGKey(0), x, cfg.padding, False,
        rnd_hflip=cfg.rnd_hflip, rnd_vflip=cfg.rnd_vflip,
        rnd_transpose=cfg.rnd_transpose, rnd_colour=cfg.rnd_colour)
    x = aug['x']
    h_cnn, _ = nn.apply_cnn(params_cnn, x, cfg.cnn_pool, cnn_act,
                            train=False)
    feats = [x] + h_cnn[:-1]
    skips = [feats[i] if i is not None else None for i in skip_src]
    return {'bottleneck': h_cnn[-1], 'skips': skips, 'x_trans': x}

  def stage1(params_dcnn, boundary):
    h_dcnn, _ = nn.apply_dcnn(params_dcnn, boundary['bottleneck'],
                              cfg.dcnn_pool, dcnn_act, train=False,
                              skip=boundary['skips'])
    head = h_dcnn[-1]
    outputs = {'x_trans': boundary['x_trans']}
    if cfg.add_orientation:
      y_logits = head[..., :cfg.num_semantic_classes]
      outputs['d_out'] = jax.nn.softmax(
          head[..., cfg.num_semantic_classes:], axis=-1)
    else:
      y_logits = head
    if cfg.num_semantic_classes == 1:
      outputs['y_out'] = jax.nn.sigmoid(y_logits)
    else:
      outputs['y_out'] = jax.nn.softmax(y_logits, axis=-1)
    return outputs

  return stage0, stage1


# ---------------------------------------------------------------------------
# Full model 2-stage split (controller | glimpse decoder)
# ---------------------------------------------------------------------------

def full_pipeline_stages(cfg):
  """(stage0_fn, stage1_fn) for eval-mode full-model inference in the
  canvas-free (parallel-decode) configuration — the configuration where
  timesteps are independent, so the controller for microbatch ``i+1`` can
  run while the decoder is still segmenting microbatch ``i``.

  stage0: eval augment + per-timestep controller (ctrl CNN + glimpse RNN +
  ctrl MLP), attention geometry, and the Gaussian glimpse crop ->
  boundary {x_patch, f_y, f_x, y_out_lg_gamma, h_crnn} stacked over T.
  stage1: attention CNN/D-CNN, paste, sigmoid, score MLP -> y_out [B,T,H,W],
  s_out [B,T], canvas.  Matches ``full_model_forward(train=False)``
  numerically (equality-tested on the 8-device CPU mesh)."""
  from rec_attend_tpu.models.full_model import (_bn_stacks, _overlay_bn)
  from rec_attend_tpu.nn import layers as nn
  from rec_attend_tpu.ops import attention, image_ops

  flags = cfg.resolved_input_flags()
  if flags['ctrl_add_canvas'] or flags['attn_add_canvas'] or \
     cfg.disable_overwrite:
    raise ValueError(
        'full-model pipeline staging requires the canvas-free '
        '(parallel-decode) configuration: the canvas recurrence ties the '
        'controller to the decoder output of the previous timestep')

  H, W = cfg.inp_height, cfg.inp_width
  FH, FW = cfg.filter_height, cfg.filter_width
  n_cc = len(cfg.ctrl_cnn_filter_size)
  n_ac = len(cfg.attn_cnn_filter_size)
  n_adc = len(cfg.attn_dcnn_filter_size)
  ccnn_act = [jax.nn.relu] * n_cc
  acnn_act = [jax.nn.relu] * n_ac
  adcnn_act = [jax.nn.relu] * n_adc
  gmlp_act = ([jax.nn.relu] * (cfg.num_glimpse_mlp_layers - 1)
              + [lambda z: jax.nn.softmax(z, axis=-1)])
  cmlp_act = [jax.nn.relu] * (cfg.num_ctrl_mlp_layers - 1) + [None]
  smlp_act = [jax.nn.sigmoid]
  skip_rev = list(cfg.resolved_attn_cnn_skip())[::-1]
  cdt = jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32

  def _model_inputs(batch):
    x = image_ops.random_transformation(
        jax.random.PRNGKey(0), batch['x'], cfg.padding, False,
        rnd_hflip=cfg.rnd_hflip, rnd_vflip=cfg.rnd_vflip,
        rnd_transpose=cfg.rnd_transpose, rnd_colour=cfg.rnd_colour)['x']
    ccnn_inp_list, acnn_inp_list = [], []
    if flags['ctrl_add_inp']:
      ccnn_inp_list.append(x)
    if flags['attn_add_inp']:
      acnn_inp_list.append(x)
    if flags['ctrl_add_d_out']:
      ccnn_inp_list.append(batch['d_in'])
    if flags['attn_add_d_out']:
      acnn_inp_list.append(batch['d_in'])
    if flags['ctrl_add_y_out']:
      ccnn_inp_list.append(batch['y_in'])
    if flags['attn_add_y_out']:
      acnn_inp_list.append(batch['y_in'])
    return (jnp.concatenate(ccnn_inp_list, axis=3),
            jnp.concatenate(acnn_inp_list, axis=3))

  def stage0(params, batch):
    ccnn_inp, acnn_inp = _model_inputs(batch)
    B = ccnn_inp.shape[0]

    def per_t(ccnn_bn):
      ccnn_params = _overlay_bn(params['ctrl_cnn'], ccnn_bn)
      h_ccnn, _ = nn.apply_cnn(ccnn_params, ccnn_inp.astype(cdt),
                               cfg.ctrl_cnn_pool, ccnn_act, False)
      crnn_inp = h_ccnn[-1].reshape(B, cfg.glimpse_map_dim,
                                    cfg.glimpse_feat_dim)
      crnn_state = jnp.zeros((B, cfg.ctrl_rnn_hid_dim * 2))
      glimpse_map = jnp.ones((B, cfg.glimpse_map_dim, 1)) / cfg.glimpse_map_dim
      h_crnn = None
      for tt2 in range(cfg.num_ctrl_rnn_iter):
        crnn_glimpse = jnp.sum(crnn_inp * glimpse_map, axis=1)
        crnn_state, _, _, _ = nn.apply_lstm(params['ctrl_lstm'],
                                            crnn_glimpse, crnn_state)
        h_crnn = crnn_state[:, cfg.ctrl_rnn_hid_dim:]
        h_gmlp = nn.apply_mlp(params['glimpse_mlp'], h_crnn, gmlp_act)
        if tt2 < cfg.num_ctrl_rnn_iter - 1:
          glimpse_map = h_gmlp[-1][:, :, None]
      ctrl_out = nn.apply_mlp(params['ctrl_mlp'], h_crnn,
                              cmlp_act)[-1].astype(jnp.float32)

      attn_ctr_norm = ctrl_out[:, 0:2]
      attn_lg_size = ctrl_out[:, 2:4]
      if cfg.squash_ctrl_params:
        attn_ctr_norm = jnp.tanh(attn_ctr_norm)
        attn_lg_size = -jax.nn.softplus(attn_lg_size)
      attn_ctr, attn_size = attention.get_unnormalized_attn(
          attn_ctr_norm, attn_lg_size, H, W)
      if cfg.fixed_var:
        attn_lg_var = jnp.zeros((B, 2))
      else:
        attn_lg_var = attention.get_normalized_var(attn_size, FH, FW)
      if cfg.dynamic_var:
        attn_lg_var = ctrl_out[:, 4:6]
      if cfg.fixed_gamma:
        attn_lg_gamma = jnp.zeros((B, 1))
        y_out_lg_gamma = jnp.full((B, 1), 2.0)
      else:
        attn_lg_gamma = ctrl_out[:, 6:7]
        y_out_lg_gamma = ctrl_out[:, 8:9]
      attn_gamma = jnp.exp(attn_lg_gamma).reshape(B, 1, 1, 1)
      f_y = attention.get_gaussian_filter(
          attn_ctr[:, 0], attn_size[:, 0], attn_lg_var[:, 0], H, FH)
      f_x = attention.get_gaussian_filter(
          attn_ctr[:, 1], attn_size[:, 1], attn_lg_var[:, 1], W, FW)
      x_patch = attn_gamma * attention.extract_patch(acnn_inp, f_y, f_x)
      return {'x_patch': x_patch, 'f_y': f_y, 'f_x': f_x,
              'y_out_lg_gamma': y_out_lg_gamma, 'h_crnn': h_crnn}

    return jax.vmap(per_t)(_bn_stacks(params['ctrl_cnn']))

  def stage1(params, boundary):
    def per_t(acnn_bn, adcnn_bn, bt):
      x_patch = bt['x_patch']
      B = x_patch.shape[0]
      acnn_params = _overlay_bn(params['attn_cnn'], acnn_bn)
      h_acnn, _ = nn.apply_cnn(acnn_params, x_patch.astype(cdt),
                               cfg.attn_cnn_pool, acnn_act, False)
      h_core = h_acnn[-1].reshape(B, cfg.core_dim)
      if cfg.add_skip_conn:
        h_rev = h_acnn[::-1][1:] + [x_patch.astype(cdt)]
        adcnn_skip = [None]
        for sk, hc in zip(skip_rev, h_rev):
          adcnn_skip.append(hc if sk else None)
        adcnn_skip = (adcnn_skip + [None] * n_adc)[:n_adc]
      else:
        adcnn_skip = None
      adcnn_params = _overlay_bn(params['attn_dcnn'], adcnn_bn)
      h_adcnn, _ = nn.apply_dcnn(adcnn_params, h_acnn[-1],
                                 cfg.attn_dcnn_pool, adcnn_act, False,
                                 skip=adcnn_skip)
      y_patch = h_adcnn[-1].astype(jnp.float32)
      y_out = attention.paste_patch(y_patch, bt['f_y'], bt['f_x'])
      y_out = jax.nn.sigmoid(
          jnp.exp(bt['y_out_lg_gamma']).reshape(B, 1, 1, 1) * y_out - 5.0)
      smlp_inp = jnp.concatenate([bt['h_crnn'], h_core], axis=1)
      s_out = nn.apply_mlp(params['score_mlp'], smlp_inp,
                           smlp_act)[-1][:, 0].astype(jnp.float32)
      return y_out[..., 0], s_out

    y_t, s_t = jax.vmap(per_t)(_bn_stacks(params['attn_cnn']),
                               _bn_stacks(params['attn_dcnn']), boundary)
    return {'y_out': jnp.moveaxis(y_t, 0, 1),
            's_out': jnp.moveaxis(s_t, 0, 1),
            'canvas': jnp.max(y_t, axis=0)}

  return stage0, stage1


def full_pipeline_forward(params, batch, cfg, devices=None,
                          num_microbatches=2):
  """Pipelined full-model eval inference over 2 devices (controller |
  decoder); returns {'y_out', 's_out', 'canvas'}."""
  if devices is None:
    devices = jax.devices()
  key = ('full', cfg, tuple(devices[:2]))
  ex = _EXECUTOR_CACHE.get(key)
  if ex is None:
    s0, s1 = full_pipeline_stages(cfg)
    ex = PipelineExecutor([s0, s1], devices)
    _EXECUTOR_CACHE[key] = ex
  p0 = {k: params[k] for k in ('ctrl_cnn', 'ctrl_lstm', 'glimpse_mlp',
                               'ctrl_mlp')}
  p1 = {k: params[k] for k in ('attn_cnn', 'attn_dcnn', 'score_mlp')}
  return ex.run_batched([p0, p1], batch, num_microbatches)


_EXECUTOR_CACHE = {}


def fg_pipeline_forward(params, batch, cfg, devices=None,
                        num_microbatches=2):
  """Pipelined FG inference over 2 devices; returns the outputs dict.

  Executors (and their jitted stages) are cached per (config, devices) so
  repeated calls reuse the compiled stages instead of re-jitting."""
  if devices is None:
    devices = jax.devices()
  key = (cfg, tuple(devices[:2]))
  ex = _EXECUTOR_CACHE.get(key)
  if ex is None:
    s0, s1 = fg_pipeline_stages(cfg)
    ex = PipelineExecutor([s0, s1], devices)
    _EXECUTOR_CACHE[key] = ex
  return ex.run_batched([params['cnn'], params['dcnn']], batch,
                        num_microbatches)
