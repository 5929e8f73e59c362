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
