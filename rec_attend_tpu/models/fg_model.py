"""Fully-convolutional foreground + orientation model.

Capability twin of the reference's ``fg_model.py``: a U-Net-like CNN/DCNN
with configurable skip masks, a sigmoid FG (or softmax semantic) head and an
optional 8-bin orientation softmax head, trained with IoU/BCE + masked
orientation cross-entropy.

Note: the reference file was actually broken (``import image_ops_old``,
fg_model.py:4, module absent); this implementation provides the behaviour
the rest of the pipeline expects.  Static input shapes (XLA requirement;
the reference used dynamic [None, None] spatial dims).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rec_attend_tpu.config import FGModelConfig
from rec_attend_tpu.nn import layers as nn
from rec_attend_tpu.ops import image_ops, losses


def _dcnn_skip_plan(cfg: FGModelConfig):
  """Which CNN feature (by index into [x] + h_cnn[:-1]) feeds each DCNN
  layer (ref fg_model.py:131-153). Returns (skip_src, skip_ch): lists of
  source index (or None) and channel count per DCNN layer."""
  cnn_ch = (cfg.inp_depth,) + tuple(cfg.cnn_depth)
  if not cfg.add_skip_conn:
    n = len(cfg.dcnn_filter_size)
    return [None] * n, None
  cnn_mask = cfg.resolved_cnn_skip_mask()
  dcnn_mask = cfg.resolved_dcnn_skip_mask()
  # Collect skip sources: index i refers to x (i=0) or h_cnn[i-1].
  src_idx = [i for i, sk in enumerate(cnn_mask) if sk]
  src_ch = [cnn_ch[i] for i in src_idx]
  counter = len(src_idx) - 1
  skip_src = [None]          # layer 0 never gets a skip
  skip_ch = [0]
  for sk in dcnn_mask:
    if sk:
      skip_src.append(src_idx[counter])
      skip_ch.append(src_ch[counter])
      counter -= 1
    else:
      skip_src.append(None)
      skip_ch.append(0)
  n = len(cfg.dcnn_filter_size)
  skip_src = (skip_src + [None] * n)[:n]
  skip_ch = (skip_ch + [0] * n)[:n]
  return skip_src, skip_ch


def init_fg_model(key, cfg: FGModelConfig):
  k1, k2 = jax.random.split(key)
  cnn_ch = (cfg.inp_depth,) + tuple(cfg.cnn_depth)
  dcnn_ch = (cfg.cnn_depth[-1],) + tuple(cfg.dcnn_depth)
  n_c = len(cfg.cnn_filter_size)
  n_d = len(cfg.dcnn_filter_size)
  _, skip_ch = _dcnn_skip_plan(cfg)
  dcnn_use_bn = [cfg.use_bn] * (n_d - 1) + [False]
  expected_out = cfg.num_semantic_classes + (
      cfg.num_orientation_classes if cfg.add_orientation else 0)
  if cfg.dcnn_depth[-1] != expected_out:
    raise ValueError(
        f'Last dcnn channel {cfg.dcnn_depth[-1]} != expected {expected_out} '
        '(ref fg_model.py:168-177)')
  return {
      'cnn': nn.init_cnn(k1, cfg.cnn_filter_size, cnn_ch,
                         [cfg.use_bn] * n_c),
      'dcnn': nn.init_dcnn(k2, cfg.dcnn_filter_size, dcnn_ch, dcnn_use_bn,
                           skip_ch=skip_ch),
  }


def fg_model_forward(params, batch, cfg: FGModelConfig, train: bool, key):
  """Returns (outputs, new_params).

  batch: 'x' [B,H,W,D], 'y_gt' [B,H,W,C_sem] (+ 'd_gt' [B,H,W,C_ori])."""
  x = batch['x']
  y_gt = batch['y_gt']
  d_gt = batch.get('d_gt')
  aug = image_ops.random_transformation(
      key, x, cfg.padding, train, rnd_hflip=cfg.rnd_hflip,
      rnd_vflip=cfg.rnd_vflip, rnd_transpose=cfg.rnd_transpose,
      rnd_colour=cfg.rnd_colour, y=None, d=d_gt, c=y_gt)
  x, y_gt = aug['x'], aug['c']
  d_gt = aug.get('d', d_gt)

  n_c = len(cfg.cnn_filter_size)
  n_d = len(cfg.dcnn_filter_size)
  cnn_act = [jax.nn.relu] * n_c
  dcnn_act = [jax.nn.relu] * (n_d - 1) + [None]

  h_cnn, new_cnn_bn = nn.apply_cnn(params['cnn'], x, cfg.cnn_pool, cnn_act,
                                   train)
  skip_src, _ = _dcnn_skip_plan(cfg)
  feats = [x] + h_cnn[:-1]
  skips = [feats[i] if i is not None else None for i in skip_src]
  h_dcnn, new_dcnn_bn = nn.apply_dcnn(params['dcnn'], h_cnn[-1],
                                      cfg.dcnn_pool, dcnn_act, train,
                                      skip=skips)
  head = h_dcnn[-1]

  outputs = {'x_trans': x, 'y_gt_trans': y_gt}
  if cfg.add_orientation:
    y_logits = head[..., :cfg.num_semantic_classes]
    d_logits = head[..., cfg.num_semantic_classes:]
    outputs['d_out'] = jax.nn.softmax(d_logits, axis=-1)
    outputs['d_gt_trans'] = d_gt
  else:
    y_logits = head
  if cfg.num_semantic_classes == 1:
    outputs['y_out'] = jax.nn.sigmoid(y_logits)
  else:
    outputs['y_out'] = jax.nn.softmax(y_logits, axis=-1)

  from rec_attend_tpu.models.full_model import _write_back_bn
  new_params = {
      'cnn': _write_back_bn(params['cnn'], new_cnn_bn),
      'dcnn': _write_back_bn(params['dcnn'], new_dcnn_bn),
  }
  return outputs, new_params


def fg_model_loss(params, batch, cfg: FGModelConfig, train, key, step=0):
  """FG loss (+ masked orientation CE) and metrics
  (ref fg_model.py:196-266)."""
  outputs, new_params = fg_model_forward(params, batch, cfg, train, key)
  y_out = outputs['y_out']
  y_gt = outputs['y_gt_trans']
  num_pixel = y_out.shape[0] * y_out.shape[1] * y_out.shape[2]

  if cfg.num_semantic_classes > 1:
    y_gt_mask = jnp.max(y_gt[..., 1:], axis=-1, keepdims=True)
    y_out_hard = (y_out == jnp.max(y_out, axis=-1,
                                   keepdims=True)).astype(jnp.float32)
    iou_soft = losses.f_iou_all(y_out[..., 1:], y_gt[..., 1:])
    iou_hard = losses.f_iou_all(y_out_hard[..., 1:], y_gt[..., 1:])
    segloss = jnp.sum(losses.f_ce(y_out, y_gt)) / num_pixel
  else:
    y_gt_mask = y_gt
    y_out_hard = (y_out > 0.5).astype(jnp.float32)
    iou_soft = losses.f_iou_all(y_out, y_gt)
    iou_hard = losses.f_iou_all(y_out_hard, y_gt)
    segloss = jnp.sum(losses.f_bce(y_out, y_gt)) / num_pixel

  if cfg.segm_loss_fn == 'iou':
    loss = -iou_soft
  elif cfg.segm_loss_fn == 'bce':
    loss = segloss
  else:
    raise ValueError(f'Unknown segm_loss_fn: {cfg.segm_loss_fn}')
  foreground_loss = loss

  aux = {
      'outputs': outputs,
      'new_params': new_params,
      'iou_soft': iou_soft,
      'iou_hard': iou_hard,
      'foreground_loss': foreground_loss,
  }

  if cfg.add_orientation:
    d_out = outputs['d_out']
    d_gt = outputs['d_gt_trans']
    num_pixel_ori = jnp.sum(y_gt_mask)
    ori_ce = jnp.sum(losses.f_ce(d_out, d_gt) * y_gt_mask) / num_pixel_ori
    loss = loss + ori_ce
    correct = (jnp.argmax(d_out, axis=-1) == jnp.argmax(d_gt, axis=-1))
    mask2 = y_gt_mask[..., 0]
    ori_acc = jnp.sum(correct.astype(jnp.float32) * mask2) / jnp.sum(mask2)
    aux['orientation_ce'] = ori_ce
    aux['orientation_acc'] = ori_acc

  wd_loss = nn.weight_decay_loss(params, cfg.weight_decay)
  total = loss + wd_loss
  aux['loss'] = total
  aux['wd_loss'] = wd_loss
  from rec_attend_tpu.models.full_model import learn_rate
  aux['learn_rate'] = learn_rate(cfg, step)
  return total, aux
