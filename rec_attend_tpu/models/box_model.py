"""Box pretraining model: the controller pathway only.

Capability twin of the reference's ``box_model.py``: same CNN+LSTM+glimpse
controller as the full model, but no mask decoder — the canvas is driven by
(greedy-matched, noise-degraded) *groundtruth* masks in both train and eval
(ref box_model.py:484-505), and only box + confidence losses are optimised.
Produces the ``weights.h5`` consumed by the full model's
``pretrain_ctrl_net``.

Structured as one ``jax.lax.scan`` over timesteps, like models/full_model.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rec_attend_tpu.config import BoxModelConfig
from rec_attend_tpu.nn import layers as nn
from rec_attend_tpu.ops import attention, boxes, image_ops, losses, matching
from rec_attend_tpu.models.full_model import (_bn_stacks, _overlay_bn,
                                              _write_back_bn)


def init_box_model(key, cfg: BoxModelConfig):
  keys = jax.random.split(key, 5)
  t = cfg.timespan
  ccnn_ch = (cfg.ccnn_inp_depth,) + tuple(cfg.ctrl_cnn_depth)
  n_cc = len(cfg.ctrl_cnn_filter_size)
  gmlp_dims = ([cfg.ctrl_rnn_hid_dim] * cfg.num_glimpse_mlp_layers
               + [cfg.glimpse_map_dim])
  cmlp_dims = ([cfg.ctrl_rnn_hid_dim]
               + [cfg.ctrl_mlp_dim] * (cfg.num_ctrl_mlp_layers - 1) + [9])
  return {
      'ctrl_cnn': nn.init_cnn(keys[0], cfg.ctrl_cnn_filter_size, ccnn_ch,
                              [cfg.use_bn] * n_cc, num_bn_copies=t),
      'ctrl_lstm': nn.init_lstm(keys[1], cfg.glimpse_feat_dim,
                                cfg.ctrl_rnn_hid_dim),
      'glimpse_mlp': nn.init_mlp(keys[2], gmlp_dims),
      'ctrl_mlp': nn.init_mlp(keys[3], cmlp_dims),
      'score_mlp': nn.init_mlp(
          keys[4], [cfg.ctrl_rnn_hid_dim, cfg.num_semantic_classes]),
  }


def load_pretrained(params, cfg: BoxModelConfig):
  """Pretrained CNN loading with prefix sniffing (ref box_model.py:184-219)
  and full-net loading (ref box_model.py:250-358)."""
  from rec_attend_tpu.nn import params as P
  src = cfg.pretrain_net or cfg.pretrain_cnn
  if src:
    loaded = P.load_net_h5(src, 'ctrl_cnn', cnn_prefix_sniff=True)
    params['ctrl_cnn'] = P.merge_pretrained(params['ctrl_cnn'], loaded,
                                            cfg.timespan)
  if cfg.pretrain_net:
    for net in ('ctrl_mlp', 'glimpse_mlp', 'score_mlp'):
      params[net] = P.merge_pretrained(
          params[net], P.load_net_h5(cfg.pretrain_net, net))
    lstm = P.load_net_h5(cfg.pretrain_net, 'ctrl_lstm')
    if lstm is not None:
      params['ctrl_lstm'] = lstm
  return params


def freeze_mask(params, cfg: BoxModelConfig):
  n_frozen = 0
  if (cfg.pretrain_net or cfg.pretrain_cnn) and cfg.freeze_pretrain_cnn:
    # The reference freezes only the layers actually loaded; with full nets
    # in our h5 files that is every ctrl_cnn layer.
    n_frozen = len(params['ctrl_cnn'])
  mask = {net: jax.tree_util.tree_map(lambda _: False, sub)
          for net, sub in params.items()}
  mask['ctrl_cnn'] = [
      jax.tree_util.tree_map(lambda _: i < n_frozen, layer)
      for i, layer in enumerate(params['ctrl_cnn'])]
  return mask


def box_model_forward(params, batch, cfg: BoxModelConfig, train: bool, key,
                      step=0):
  """Run the box model; returns (outputs, new_params)."""
  B = batch['x'].shape[0]
  T = cfg.timespan
  H, W = cfg.inp_height, cfg.inp_width
  FH, FW = cfg.filter_height, cfg.filter_width

  key, k_aug, k_scan = jax.random.split(key, 3)

  x = batch['x']
  y_gt = batch['y_gt']
  d_in = batch.get('d_in')
  y_in = batch.get('y_in')
  aug = image_ops.random_transformation(
      k_aug, x, cfg.padding, train, rnd_hflip=cfg.rnd_hflip,
      rnd_vflip=cfg.rnd_vflip, rnd_transpose=cfg.rnd_transpose,
      rnd_colour=cfg.rnd_colour, y=y_gt, d=d_in, c=y_in)
  x, y_gt = aug['x'], aug['y']
  d_in = aug.get('d', d_in)
  y_in = aug.get('c', y_in)
  s_gt = batch['s_gt']

  # GT boxes (ref box_model.py:386-393; default min_padding=10).
  attn_top_left_gt, attn_bot_right_gt, attn_box_gt = boxes.get_gt_box(
      y_gt, padding_ratio=cfg.attn_box_padding_ratio, center_shift_ratio=0.0)
  attn_ctr_gt, attn_size_gt = attention.get_box_ctr_size(
      attn_top_left_gt, attn_bot_right_gt)
  attn_ctr_norm_gt = attention.get_normalized_center(attn_ctr_gt, H, W)
  attn_lg_size_gt = attention.get_normalized_size(attn_size_gt, H, W)

  n_cc = len(cfg.ctrl_cnn_filter_size)
  ccnn_act = [jax.nn.relu] * n_cc
  gmlp_act = ([jax.nn.relu] * (cfg.num_glimpse_mlp_layers - 1)
              + [lambda z: jax.nn.softmax(z, axis=-1)])
  cmlp_act = [jax.nn.relu] * (cfg.num_ctrl_mlp_layers - 1) + [None]
  smlp_act = [None]

  const_ones = jnp.ones((B, FH, FW, 1))
  attn_box_beta = -5.0

  xs = {
      'ccnn_bn': _bn_stacks(params['ctrl_cnn']),
      'key': jax.random.split(k_scan, T),
      't_index': jnp.arange(T),
  }

  def body(carry, xt):
    canvas, grd_cum = carry

    inp_list = [x, canvas]
    if cfg.add_d_out:
      inp_list.append(d_in)
    if cfg.add_y_out:
      inp_list.append(y_in)
    ccnn_inp = jnp.concatenate(inp_list, axis=3)

    ccnn_params = _overlay_bn(params['ctrl_cnn'], xt['ccnn_bn'])
    h_ccnn, new_ccnn_bn = nn.apply_cnn(
        ccnn_params, ccnn_inp, cfg.ctrl_cnn_pool, ccnn_act, train)

    crnn_inp = h_ccnn[-1].reshape(B, cfg.glimpse_map_dim, cfg.glimpse_feat_dim)
    crnn_state = jnp.zeros((B, cfg.ctrl_rnn_hid_dim * 2))
    glimpse_map = jnp.ones((B, cfg.glimpse_map_dim, 1)) / cfg.glimpse_map_dim
    glimpse_maps = []
    h_crnn = None
    for tt2 in range(cfg.num_ctrl_rnn_iter):
      glimpse_maps.append(glimpse_map)
      crnn_glimpse = jnp.sum(crnn_inp * glimpse_map, axis=1)
      crnn_state, _, _, _ = nn.apply_lstm(params['ctrl_lstm'], crnn_glimpse,
                                          crnn_state)
      h_crnn = crnn_state[:, cfg.ctrl_rnn_hid_dim:]
      h_gmlp = nn.apply_mlp(params['glimpse_mlp'], h_crnn, gmlp_act)
      if tt2 < cfg.num_ctrl_rnn_iter - 1:
        glimpse_map = h_gmlp[-1][:, :, None]

    ctrl_out = nn.apply_mlp(params['ctrl_mlp'], h_crnn, cmlp_act)[-1]

    attn_ctr_norm = ctrl_out[:, 0:2]
    attn_lg_size = ctrl_out[:, 2:4]
    if cfg.squash_ctrl_params:
      attn_ctr_norm = jnp.tanh(attn_ctr_norm)
      attn_lg_size = -jax.nn.softplus(attn_lg_size)
    attn_ctr, attn_size = attention.get_unnormalized_attn(
        attn_ctr_norm, attn_lg_size, H, W)
    attn_box_lg_gamma = ctrl_out[:, 7:8]
    if cfg.fixed_var:
      attn_lg_var = jnp.zeros((B, 2))
    else:
      attn_lg_var = attention.get_normalized_var(attn_size, FH, FW)
    if cfg.dynamic_var:
      attn_lg_var = ctrl_out[:, 4:6]
    attn_box_gamma = jnp.exp(attn_box_lg_gamma).reshape(B, 1, 1, 1)
    attn_top_left, attn_bot_right = attention.get_box_coord(
        attn_ctr, attn_size)

    f_y = attention.get_gaussian_filter(
        attn_ctr[:, 0], attn_size[:, 0], attn_lg_var[:, 0], H, FH)
    f_x = attention.get_gaussian_filter(
        attn_ctr[:, 1], attn_size[:, 1], attn_lg_var[:, 1], W, FW)
    attn_box = attn_box_gamma * attention.paste_patch(const_ones, f_y, f_x)
    attn_box = jax.nn.sigmoid(attn_box + attn_box_beta)[..., 0]

    # Canvas from GT masks (greedy matched unless fixed order), always —
    # both phases (ref box_model.py:484-505).
    if cfg.fixed_order:
      y_sel = y_gt[:, xt['t_index'], :, :][..., None]
      iou_soft_box_t = None
    else:
      if cfg.use_iou_box:
        iou_soft_box_t = losses.f_iou_box(
            attn_top_left[:, None, :], attn_bot_right[:, None, :],
            attn_top_left_gt, attn_bot_right_gt)
      else:
        iou_soft_box_t = (losses.f_inter(attn_box[:, None], attn_box_gt) /
                          losses.f_union(attn_box[:, None], attn_box_gt))
      grd_match = losses.f_greedy_match(iou_soft_box_t, grd_cum)
      if cfg.accumulate_greedy_match:
        grd_cum = jax.lax.stop_gradient(
            jnp.minimum(grd_cum + grd_match, 1.0))
      y_sel = jnp.sum(grd_match[:, :, None, None] * y_gt, axis=1)[..., None]
    noise = jax.random.uniform(xt['key'], (B, H, W, 1), minval=0.0,
                               maxval=cfg.gt_segm_noise)
    y_sel = y_sel - y_sel * noise
    canvas = jax.lax.stop_gradient(jnp.maximum(y_sel, canvas))

    s_out = nn.apply_mlp(params['score_mlp'], h_crnn, smlp_act)[-1]
    if cfg.num_semantic_classes == 1:
      s_out = jax.nn.sigmoid(s_out)
    else:
      s_out = jax.nn.softmax(s_out, axis=-1)

    ys = {
        's_out': s_out,
        'attn_box': attn_box,
        'attn_ctr': attn_ctr,
        'attn_size': attn_size,
        'attn_top_left': attn_top_left,
        'attn_bot_right': attn_bot_right,
        'attn_ctr_norm': attn_ctr_norm,
        'attn_lg_size': attn_lg_size,
        'glimpse_map': jnp.stack(glimpse_maps, axis=1)[..., 0].reshape(
            B, cfg.num_ctrl_rnn_iter, cfg.crnn_h, cfg.crnn_w),
        'ccnn_bn': new_ccnn_bn,
    }
    if iou_soft_box_t is not None:
      ys['iou_soft_box_t'] = iou_soft_box_t
    return (canvas, grd_cum), ys

  if cfg.remat:
    body = jax.checkpoint(body)

  canvas0 = jnp.zeros((B, H, W, 1))
  (canvas, _), ys = jax.lax.scan(body, (canvas0, jnp.zeros((B, T))), xs)

  def t_to_batch(a):
    return jnp.moveaxis(a, 0, 1)

  outputs = {
      'x_trans': x, 'y_gt_trans': y_gt, 's_gt': s_gt,
      'attn_ctr_gt': attn_ctr_gt, 'attn_size_gt': attn_size_gt,
      'attn_top_left_gt': attn_top_left_gt,
      'attn_bot_right_gt': attn_bot_right_gt, 'attn_box_gt': attn_box_gt,
      'attn_ctr_norm_gt': attn_ctr_norm_gt,
      'attn_lg_size_gt': attn_lg_size_gt,
  }
  for k, v in ys.items():
    if k == 'ccnn_bn':
      continue
    outputs[k] = t_to_batch(v)
  if cfg.num_semantic_classes == 1:
    outputs['s_out'] = outputs['s_out'][:, :, 0]

  new_params = dict(params)
  new_params['ctrl_cnn'] = _write_back_bn(params['ctrl_cnn'], ys['ccnn_bn'])
  return outputs, new_params


def box_model_loss(params, batch, cfg: BoxModelConfig, train, key, step,
                   matcher='jax'):
  """Box + confidence loss (ref box_model.py:548-652)."""
  outputs, new_params = box_model_forward(params, batch, cfg, train, key,
                                          step)
  s_gt = outputs['s_gt']
  s_out = outputs['s_out']
  attn_box = outputs['attn_box']
  attn_box_gt = outputs['attn_box_gt']
  B = attn_box.shape[0]
  T = cfg.timespan

  if cfg.fixed_order:
    iou_soft_box = losses.f_iou(attn_box, attn_box_gt)
    match_box = matching.get_identity_match(T, s_gt)
  else:
    iou_soft_box = outputs['iou_soft_box_t']
    match_box = matching.f_segm_match(iou_soft_box, s_gt, matcher=matcher)
  match_box = jax.lax.stop_gradient(match_box)

  match_count_box = jnp.maximum(jnp.sum(match_box, axis=(1, 2)), 1.0)
  if cfg.fixed_order:
    iou_soft_box_mask = iou_soft_box
  else:
    iou_soft_box_mask = jnp.sum(iou_soft_box * match_box, axis=1)
  iou_soft_box_scalar = jnp.sum(
      jnp.sum(iou_soft_box_mask, axis=1) / match_count_box) / B

  attn_params = jnp.concatenate(
      [outputs['attn_ctr_norm'], outputs['attn_lg_size']], axis=2)
  attn_params_gt = jnp.concatenate(
      [outputs['attn_ctr_norm_gt'], outputs['attn_lg_size_gt']], axis=2)

  if cfg.box_loss_fn == 'mse':
    box_loss = losses.f_match_loss(attn_params, attn_params_gt, match_box,
                                   losses.f_squared_err)
  elif cfg.box_loss_fn == 'huber':
    box_loss = losses.f_match_loss(attn_params, attn_params_gt, match_box,
                                   losses.f_huber)
  elif cfg.box_loss_fn == 'iou':
    box_loss = -iou_soft_box_scalar
  elif cfg.box_loss_fn == 'wt_cov':
    # Area-weighted coverage of the GT boxes (ref box_model.py:600-601).
    box_loss = -losses.f_weighted_coverage(iou_soft_box, attn_box_gt)
  elif cfg.box_loss_fn == 'wt_iou':
    # The reference names wt_iou_soft_box but never defines it
    # (box_model.py:598-599, latent NameError — the flag was never used by
    # the run scripts); natural semantics: matched soft IoU weighted by GT
    # box area instead of the uniform 1/match_count average.
    wt = losses.f_coverage_weight(attn_box_gt)
    box_loss = -jnp.sum(jnp.sum(iou_soft_box_mask * wt, axis=1)) / B
  elif cfg.box_loss_fn == 'bce':
    box_loss = losses.f_match_loss(attn_box, attn_box_gt, match_box,
                                   losses.f_bce)
  else:
    raise ValueError(f'Unknown box_loss_fn: {cfg.box_loss_fn}')

  if cfg.num_semantic_classes == 1:
    conf_loss = losses.f_conf_loss(s_out, match_box, use_cum_min=True)
  else:
    conf_loss = losses.f_conf_loss(1 - s_out[:, :, 0], match_box,
                                   use_cum_min=True)

  wd_loss = nn.weight_decay_loss(params, cfg.weight_decay)
  total = box_loss + conf_loss + wd_loss

  from rec_attend_tpu.models.full_model import learn_rate
  aux = {
      'outputs': outputs,
      'new_params': new_params,
      'loss': total,
      'box_loss': box_loss,
      'conf_loss': conf_loss,
      'wd_loss': wd_loss,
      'iou_soft_box': iou_soft_box_scalar,
      'learn_rate': learn_rate(cfg, step),
      'match_box': match_box,
  }
  return total, aux
