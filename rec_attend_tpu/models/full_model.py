"""The flagship recurrent-attention instance segmentation model.

Capability twin of the reference's ``full_model.py``: at each of T timesteps
a CNN+LSTM controller looks at (image ⊕ canvas ⊕ optional priors), emits an
attention box, a Gaussian glimpse is cropped, a small CNN/D-CNN autoencoder
segments one instance inside the glimpse, the mask is pasted back and
max-accumulated into the canvas, and a score MLP emits a stop confidence.

TPU-native design deltas from the reference (ref full_model.py:638-848
builds T unrolled graph copies in Python):
  - the timestep loop is ONE ``jax.lax.scan`` whose carry is
    (canvas, RNG key); per-timestep BatchNorm parameters ride the scan as
    stacked [T, ...] inputs and the updated EMA slices come back as stacked
    outputs — constant compile size in T, remat-friendly;
  - glimpse extract / mask paste are einsum contractions (ops.attention),
    not per-channel matmul loops;
  - Hungarian matching runs in-graph (ops.hungarian) instead of a host op;
  - scheduled-sampling knob draws and GT box noise are functions of an
    explicit PRNG key and the step counter, precomputed outside the scan.

Faithful semantics notes:
  - ``grd_match_cum`` is initialised to zeros and never accumulated in the
    reference (full_model.py:589,759) — the greedy match each step is a pure
    argmax over box IoU.  We replicate that exactly.
  - The knob path for ``fixed_order=True`` references an undefined variable
    in the reference (full_model.py:747) and was therefore never exercised;
    we implement the natural semantics (per-timestep GT with noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rec_attend_tpu.config import FullModelConfig
from rec_attend_tpu.nn import layers as nn
from rec_attend_tpu.ops import attention, boxes, image_ops, losses, matching


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_full_model(key, cfg: FullModelConfig):
  """Initialise all parameter pytrees, named per the weights.h5 schema."""
  keys = jax.random.split(key, 7)
  t = cfg.timespan
  ccnn_ch = (cfg.ccnn_inp_depth,) + tuple(cfg.ctrl_cnn_depth)
  acnn_ch = (cfg.acnn_inp_depth,) + tuple(cfg.attn_cnn_depth)
  adcnn_ch = (cfg.core_depth,) + tuple(cfg.attn_dcnn_depth)
  n_cc = len(cfg.ctrl_cnn_filter_size)
  n_ac = len(cfg.attn_cnn_filter_size)
  n_adc = len(cfg.attn_dcnn_filter_size)

  adcnn_skip_ch = _adcnn_skip_channels(cfg)

  gmlp_dims = ([cfg.ctrl_rnn_hid_dim] * cfg.num_glimpse_mlp_layers
               + [cfg.glimpse_map_dim])
  cmlp_dims = ([cfg.ctrl_rnn_hid_dim]
               + [cfg.ctrl_mlp_dim] * (cfg.num_ctrl_mlp_layers - 1) + [9])

  params = {
      'ctrl_cnn': nn.init_cnn(keys[0], cfg.ctrl_cnn_filter_size, ccnn_ch,
                              [cfg.use_bn] * n_cc, num_bn_copies=t),
      'ctrl_lstm': nn.init_lstm(keys[1], cfg.glimpse_feat_dim,
                                cfg.ctrl_rnn_hid_dim),
      'glimpse_mlp': nn.init_mlp(keys[2], gmlp_dims),
      'ctrl_mlp': nn.init_mlp(keys[3], cmlp_dims),
      'attn_cnn': nn.init_cnn(keys[4], cfg.attn_cnn_filter_size, acnn_ch,
                              [cfg.use_bn] * n_ac, num_bn_copies=t),
      'score_mlp': nn.init_mlp(
          keys[5], [cfg.ctrl_rnn_hid_dim + cfg.core_dim, 1]),
      'attn_dcnn': nn.init_dcnn(keys[6], cfg.attn_dcnn_filter_size, adcnn_ch,
                                [cfg.use_bn] * n_adc,
                                skip_ch=adcnn_skip_ch, num_bn_copies=t),
  }
  return params


def _adcnn_skip_channels(cfg: FullModelConfig):
  """Skip channel counts feeding each DCNN layer (ref full_model.py:494-502).

  Layer 0 gets none; layer i>=1 concatenates the reversed attention-CNN
  feature map (or the raw glimpse input for the last one) when the skip
  mask allows."""
  if not cfg.add_skip_conn:
    return None
  acnn_ch = (cfg.acnn_inp_depth,) + tuple(cfg.attn_cnn_depth)
  channels_rev = list(acnn_ch[::-1][1:]) + [cfg.acnn_inp_depth]
  skip_rev = list(cfg.resolved_attn_cnn_skip())[::-1]
  skip_ch = [0]
  for sk, ch in zip(skip_rev, channels_rev):
    skip_ch.append(ch if sk else 0)
  # pad/trim to the DCNN layer count
  n = len(cfg.attn_dcnn_filter_size)
  skip_ch = (skip_ch + [0] * n)[:n]
  return skip_ch


def load_pretrained(params, cfg: FullModelConfig):
  """Overlay pretrained weights.h5 files per the reference's loading rules
  (full_model.py:271-284, 315-326, 355-363, 386-398, 421-434, 504-517)."""
  from rec_attend_tpu.nn import params as P
  ctrl_src = cfg.pretrain_net or cfg.pretrain_ctrl_net
  attn_src = cfg.pretrain_net or cfg.pretrain_attn_net
  if ctrl_src:
    for net in ('ctrl_cnn', 'ctrl_mlp', 'glimpse_mlp'):
      params[net] = P.merge_pretrained(
          params[net], P.load_net_h5(ctrl_src, net), cfg.timespan)
    lstm = P.load_net_h5(ctrl_src, 'ctrl_lstm')
    if lstm is not None:
      params['ctrl_lstm'] = lstm
  if attn_src:
    for net in ('attn_cnn', 'attn_dcnn'):
      params[net] = P.merge_pretrained(
          params[net], P.load_net_h5(attn_src, net), cfg.timespan)
  if cfg.pretrain_net:
    params['score_mlp'] = P.merge_pretrained(
        params['score_mlp'], P.load_net_h5(cfg.pretrain_net, 'score_mlp'))
  return params


def freeze_mask(params, cfg: FullModelConfig):
  """True where a leaf should NOT be updated (ref freeze_* flags)."""
  frozen_nets = {
      'ctrl_cnn': cfg.freeze_ctrl_cnn,
      'ctrl_lstm': cfg.freeze_ctrl_rnn,
      'glimpse_mlp': cfg.freeze_ctrl_rnn,
      'ctrl_mlp': cfg.freeze_ctrl_mlp,
      'attn_cnn': cfg.freeze_attn_net,
      'attn_dcnn': cfg.freeze_attn_net,
      'score_mlp': False,
  }
  return {net: jax.tree_util.tree_map(lambda _: frozen_nets[net], sub)
          for net, sub in params.items()}


# ---------------------------------------------------------------------------
# Knob schedules  (ref full_model.py:586-625)
# ---------------------------------------------------------------------------

def knob_probs(cfg: FullModelConfig, step):
  """Scheduled-sampling probabilities for (box, segm) GT mixing; [1, T, 1]."""
  t = cfg.timespan
  if cfg.knob_use_timescale:
    time_scale = (1.0 + jnp.log(
        1.0 + jnp.arange(t, dtype=jnp.float32) * 3.0)).reshape(1, t, 1)
  else:
    time_scale = jnp.ones((1, t, 1))
  step = jnp.asarray(step, jnp.float32)

  def expdecay(offset):
    s = jnp.maximum(0.0, step - offset)
    return cfg.knob_base * cfg.knob_decay ** (s / cfg.steps_per_knob_decay)

  p_box = jnp.minimum(1.0, expdecay(cfg.knob_box_offset) * time_scale)
  p_segm = jnp.minimum(1.0, expdecay(cfg.knob_segm_offset) * time_scale)
  return p_box, p_segm


def learn_rate(cfg, step):
  """Staircase exponential decay (ref full_model.py:1039-1044)."""
  step = jnp.asarray(step, jnp.float32)
  return cfg.base_learn_rate * cfg.learn_rate_decay ** jnp.floor(
      step / cfg.steps_per_learn_rate_decay)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _overlay_bn(layer_params, bn_list):
  """Replace each layer's 'bn' entry with the given single-copy dicts."""
  out = []
  for layer, bn in zip(layer_params, bn_list):
    if bn is not None:
      out.append(dict(layer, bn=bn))
    else:
      out.append({k: v for k, v in layer.items() if k != 'bn'})
  return out


def _bn_stacks(layer_params):
  """Extract the list of per-timestep BN stacks (None for bn-less layers)."""
  return [layer.get('bn') for layer in layer_params]


def _write_back_bn(layer_params, new_stacks):
  out = []
  for layer, bn in zip(layer_params, new_stacks):
    if bn is not None:
      out.append(dict(layer, bn=bn))
    else:
      out.append(layer)
  return out


def full_model_forward(params, batch, cfg: FullModelConfig, train: bool,
                       key, step=0):
  """Run the full T-step model.

  Args:
    params: pytree from init_full_model.
    batch: dict with 'x' [B,H,W,D], 'y_gt' [B,T,H,W], 's_gt' [B,T]
      (+ 'd_in' [B,H,W,8], 'y_in' [B,H,W,C] when cfg.add_d_out/add_y_out).
    train: python bool (two jit specialisations, vs the reference's
      phase_train float blending).
    key: PRNG key; step: global step (for knob schedules).
  Returns:
    (outputs dict, new_params) — new_params carries updated BN EMA.
  """
  flags = cfg.resolved_input_flags()
  B = batch['x'].shape[0]
  T = cfg.timespan
  H, W = cfg.inp_height, cfg.inp_width
  FH, FW = cfg.filter_height, cfg.filter_width

  key, k_aug, k_noise, k_knob_box, k_knob_segm, k_scan = jax.random.split(
      key, 6)

  # ---- augmentation (ref full_model.py:202-234) -----------------------
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

  # ---- groundtruth attention boxes (ref full_model.py:557-584) --------
  min_pad = cfg.padding + 4.0
  (attn_ctr_gt, attn_size_gt, _, _, attn_box_gt, attn_top_left_gt,
   attn_bot_right_gt) = boxes.get_gt_attn(
       y_gt, FH, FW, padding_ratio=cfg.attn_box_padding_ratio,
       center_shift_ratio=0.0, min_padding=min_pad)
  k_n1, k_n2 = jax.random.split(k_noise)
  pad_noise = jax.random.uniform(
      k_n1, (B, T, 1), minval=cfg.attn_box_padding_ratio - cfg.gt_box_pad_noise,
      maxval=cfg.attn_box_padding_ratio + cfg.gt_box_pad_noise)
  ctr_noise = jax.random.uniform(
      k_n2, (B, T, 2), minval=-cfg.gt_box_ctr_noise,
      maxval=cfg.gt_box_ctr_noise)
  (attn_ctr_gtn, attn_size_gtn, _, _, _, _, _) = boxes.get_gt_attn(
      y_gt, FH, FW, padding_ratio=pad_noise, center_shift_ratio=ctr_noise,
      min_padding=min_pad)
  attn_ctr_norm_gt = attention.get_normalized_center(attn_ctr_gt, H, W)
  attn_lg_size_gt = attention.get_normalized_size(attn_size_gt, H, W)

  # ---- knob draws (ref full_model.py:586-625) -------------------------
  p_box, p_segm = knob_probs(cfg, step)
  knob_box = (jax.random.uniform(k_knob_box, (B, T, 1)) <=
              p_box).astype(jnp.float32)
  knob_segm = (jax.random.uniform(k_knob_segm, (B, T, 1)) <=
               p_segm).astype(jnp.float32)
  if not train:
    knob_box = jnp.zeros_like(knob_box)
    knob_segm = jnp.zeros_like(knob_segm)

  # ---- static nets ----------------------------------------------------
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

  const_ones = jnp.ones((B, FH, FW, 1))
  attn_box_beta = -5.0
  y_out_beta = -5.0

  if cfg.use_pallas:
    from rec_attend_tpu.ops.pallas import glimpse as glimpse_k
    extract_fn, paste_fn = glimpse_k.extract_patch, glimpse_k.paste_patch
  else:
    extract_fn, paste_fn = attention.extract_patch, attention.paste_patch

  # Compute dtype for the conv/matmul stacks (bf16 MXU path); attention
  # geometry, losses and BN statistics stay f32.
  cdt = jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32

  skip_rev = list(cfg.resolved_attn_cnn_skip())[::-1]

  # scan xs: per-timestep BN stacks + per-timestep GT/knob slices + keys
  xs = {
      'ccnn_bn': _bn_stacks(params['ctrl_cnn']),
      'acnn_bn': _bn_stacks(params['attn_cnn']),
      'adcnn_bn': _bn_stacks(params['attn_dcnn']),
      'knob_box': jnp.moveaxis(knob_box, 1, 0),      # [T, B, 1]
      'knob_segm': jnp.moveaxis(knob_segm, 1, 0),
      'key': jax.random.split(k_scan, T),
      't_index': jnp.arange(T),
  }

  def body(carry, xt):
    canvas, grd_cum = carry  # [B, H, W, 1], [B, T]

    ccnn_inp_list = []
    acnn_inp_list = []
    if flags['ctrl_add_inp']:
      ccnn_inp_list.append(x)
    if flags['attn_add_inp']:
      acnn_inp_list.append(x)
    if flags['ctrl_add_canvas']:
      ccnn_inp_list.append(canvas)
    if flags['attn_add_canvas']:
      acnn_inp_list.append(canvas)
    if flags['ctrl_add_d_out']:
      ccnn_inp_list.append(d_in)
    if flags['attn_add_d_out']:
      acnn_inp_list.append(d_in)
    if flags['ctrl_add_y_out']:
      ccnn_inp_list.append(y_in)
    if flags['attn_add_y_out']:
      acnn_inp_list.append(y_in)
    ccnn_inp = jnp.concatenate(ccnn_inp_list, axis=3).astype(cdt)
    acnn_inp = jnp.concatenate(acnn_inp_list, axis=3)

    # Controller CNN with this timestep's BN copy.
    ccnn_params = _overlay_bn(params['ctrl_cnn'], xt['ccnn_bn'])
    h_ccnn, new_ccnn_bn = nn.apply_cnn(
        ccnn_params, ccnn_inp, cfg.ctrl_cnn_pool, ccnn_act, train)
    h_ccnn_last = h_ccnn[-1]

    # Inner glimpse RNN (ref full_model.py:668-689).
    crnn_inp = h_ccnn_last.reshape(B, cfg.glimpse_map_dim,
                                   cfg.glimpse_feat_dim)
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

    ctrl_out = nn.apply_mlp(params['ctrl_mlp'], h_crnn,
                            cmlp_act)[-1].astype(jnp.float32)

    # 9-dof controller output (ref full_model.py:691-722).
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
    attn_box_lg_gamma = ctrl_out[:, 7:8]
    attn_gamma = jnp.exp(attn_lg_gamma).reshape(B, 1, 1, 1)
    attn_box_gamma = jnp.exp(attn_box_lg_gamma).reshape(B, 1, 1, 1)

    # Render the attention box from the *predicted* params
    # (ref full_model.py:727-741).
    f_y = attention.get_gaussian_filter(
        attn_ctr[:, 0], attn_size[:, 0], attn_lg_var[:, 0], H, FH)
    f_x = attention.get_gaussian_filter(
        attn_ctr[:, 1], attn_size[:, 1], attn_lg_var[:, 1], W, FW)
    attn_box = paste_fn(const_ones * attn_box_gamma, f_y, f_x)
    attn_box = jax.nn.sigmoid(attn_box + attn_box_beta)[..., 0]  # [B, H, W]

    # Soft box IoU vs GT (pre-mix), used by both knob mixing and box loss.
    if cfg.use_iou_box:
      tl, br = attention.get_box_coord(attn_ctr, attn_size)
      iou_soft_box_t = losses.f_iou_box(
          tl[:, None, :], br[:, None, :], attn_top_left_gt,
          attn_bot_right_gt)                                    # [B, T]
    else:
      iou_soft_box_t = (losses.f_inter(attn_box[:, None], attn_box_gt) /
                        losses.f_union(attn_box[:, None], attn_box_gt))

    # Scheduled-sampling: mix in (noisy) GT box (ref full_model.py:743-776).
    if cfg.use_knob:
      if cfg.fixed_order:
        grd_match = None
        attn_ctr_gtm = attn_ctr_gtn[:, xt['t_index'], :]
        attn_size_gtm = attn_size_gtn[:, xt['t_index'], :]
      else:
        # The reference never accumulates grd_match_cum (full_model.py:
        # 589,759) so each step greedy-matches against all GT;
        # accumulate_greedy_match=True fixes that latent bug by excluding
        # already-claimed GT slots.
        grd_match = losses.f_greedy_match(iou_soft_box_t, grd_cum)
        if cfg.accumulate_greedy_match:
          grd_cum = jnp.minimum(grd_cum + grd_match, 1.0)
        attn_ctr_gtm = jnp.sum(grd_match[:, :, None] * attn_ctr_gtn, axis=1)
        attn_size_gtm = jnp.sum(grd_match[:, :, None] * attn_size_gtn, axis=1)
      if train:
        kb = xt['knob_box']  # [B, 1]
        attn_ctr = kb * attn_ctr_gtm + (1 - kb) * attn_ctr
        attn_size = kb * attn_size_gtm + (1 - kb) * attn_size
    else:
      grd_match = None

    attn_top_left, attn_bot_right = attention.get_box_coord(
        attn_ctr, attn_size)

    # Final filters from (possibly mixed) params (ref full_model.py:778-785).
    f_y = attention.get_gaussian_filter(
        attn_ctr[:, 0], attn_size[:, 0], attn_lg_var[:, 0], H, FH)
    f_x = attention.get_gaussian_filter(
        attn_ctr[:, 1], attn_size[:, 1], attn_lg_var[:, 1], W, FW)

    # Glimpse crop (ref full_model.py:788).
    x_patch = attn_gamma * extract_fn(acnn_inp, f_y, f_x)

    # Attention CNN (compute dtype).
    acnn_params = _overlay_bn(params['attn_cnn'], xt['acnn_bn'])
    h_acnn, new_acnn_bn = nn.apply_cnn(
        acnn_params, x_patch.astype(cdt), cfg.attn_cnn_pool, acnn_act, train)
    h_acnn_last = h_acnn[-1]
    h_core = h_acnn_last.reshape(B, cfg.core_dim)

    # DCNN with skip connections (ref full_model.py:798-807).
    if cfg.add_skip_conn:
      h_rev = h_acnn[::-1][1:] + [x_patch.astype(cdt)]
      adcnn_skip = [None]
      for sk, hc in zip(skip_rev, h_rev):
        adcnn_skip.append(hc if sk else None)
      adcnn_skip = (adcnn_skip + [None] * n_adc)[:n_adc]
    else:
      adcnn_skip = None
    adcnn_params = _overlay_bn(params['attn_dcnn'], xt['adcnn_bn'])
    h_adcnn, new_adcnn_bn = nn.apply_dcnn(
        adcnn_params, h_acnn_last, cfg.attn_dcnn_pool, adcnn_act, train,
        skip=adcnn_skip)
    y_out_patch = h_adcnn[-1].astype(jnp.float32)           # [B, FH, FW, 1]

    # Paste mask back to full resolution (ref full_model.py:810-818).
    y_out = paste_fn(y_out_patch, f_y, f_x)
    y_out = jax.nn.sigmoid(jnp.exp(y_out_lg_gamma).reshape(B, 1, 1, 1)
                           * y_out + y_out_beta)
    if cfg.disable_overwrite:
      y_out = (1.0 - canvas) * y_out
    y_out_map = y_out[..., 0]                               # [B, H, W]

    # Score (ref full_model.py:820-822).
    smlp_inp = jnp.concatenate([h_crnn, h_core], axis=1)
    s_out = nn.apply_mlp(params['score_mlp'], smlp_inp,
                         smlp_act)[-1][:, 0].astype(jnp.float32)

    # Knob: mix GT segmentation into the canvas (ref full_model.py:826-848).
    if cfg.use_knob and train:
      if cfg.fixed_order:
        y_mix = y_gt[:, xt['t_index'], :, :][..., None]
      else:
        y_mix = jnp.sum(grd_match[:, :, None, None] * y_gt, axis=1)[..., None]
      noise = jax.random.uniform(xt['key'], (B, H, W, 1), minval=0.0,
                                 maxval=cfg.gt_segm_noise)
      y_mix = y_mix - y_mix * noise
      ks = xt['knob_segm'][:, :, None, None]                # [B, 1, 1, 1]
      y_canvas = ks * y_mix + (1 - ks) * y_out
    else:
      y_canvas = y_out
    canvas = jnp.maximum(y_canvas, canvas)
    if cfg.stop_canvas_grad:
      canvas = jax.lax.stop_gradient(canvas)
    grd_cum = jax.lax.stop_gradient(grd_cum)

    ys = {
        'y_out': y_out_map,
        's_out': s_out,
        'y_out_patch': y_out_patch[..., 0],
        'x_patch': x_patch,
        'attn_box': attn_box,
        'iou_soft_box_t': iou_soft_box_t,
        'attn_ctr': attn_ctr,
        'attn_size': attn_size,
        'attn_top_left': attn_top_left,
        'attn_bot_right': attn_bot_right,
        'attn_ctr_norm': attn_ctr_norm,
        'attn_lg_size': attn_lg_size,
        'attn_lg_gamma': attn_lg_gamma,
        'attn_box_lg_gamma': attn_box_lg_gamma,
        'y_out_lg_gamma': y_out_lg_gamma,
        'glimpse_map': jnp.stack(glimpse_maps, axis=1)[..., 0].reshape(
            B, cfg.num_ctrl_rnn_iter, cfg.crnn_h, cfg.crnn_w),
        'ccnn_bn': new_ccnn_bn,
        'acnn_bn': new_acnn_bn,
        'adcnn_bn': new_adcnn_bn,
    }
    return (canvas, grd_cum), ys

  if cfg.remat:
    if getattr(cfg, 'remat_policy', 'full') == 'dots':
      # Save conv/matmul outputs across the scan, recompute elementwise
      # chains only (trades HBM for less backward recompute; watch the
      # [T, B, H, W, C] lane padding for C < 128).
      body = jax.checkpoint(body,
                            policy=jax.checkpoint_policies.dots_saveable)
    else:
      body = jax.checkpoint(body)

  canvas0 = jnp.zeros((B, H, W, 1))

  # Parallel decode (SURVEY §5.7c): when neither net sees the canvas and
  # outputs are not canvas-masked, the T timesteps are independent — decode
  # them all at once with vmap instead of a serial scan.  This is the
  # batched-recurrent-eval fast path for the ctrl_add_canvas=False configs
  # (ref full_model.py:140-149 exposes those flags; the reference still ran
  # serially).
  independent = (not flags['ctrl_add_canvas']
                 and not flags['attn_add_canvas']
                 and not cfg.disable_overwrite
                 and not (cfg.use_knob and train))
  use_parallel = (cfg.parallel_decode if cfg.parallel_decode is not None
                  else independent)
  grd_cum0 = jnp.zeros((B, T))
  if use_parallel and independent:
    (canvas_t, _), ys = jax.vmap(body, in_axes=((None, None), 0))(
        (canvas0, grd_cum0), xs)
    canvas = jnp.max(canvas_t, axis=0)
  else:
    (canvas, _), ys = jax.lax.scan(body, (canvas0, grd_cum0), xs,
                                   unroll=getattr(cfg, 'scan_unroll', 1))

  # Move the scan axis back to position 1: [T, B, ...] -> [B, T, ...].
  def t_to_batch(a):
    return jnp.moveaxis(a, 0, 1)

  outputs = {
      'x_trans': x, 'y_gt_trans': y_gt, 'canvas': canvas[..., 0],
      's_gt': s_gt,
      'attn_ctr_gt': attn_ctr_gt, 'attn_size_gt': attn_size_gt,
      'attn_top_left_gt': attn_top_left_gt,
      'attn_bot_right_gt': attn_bot_right_gt,
      'attn_box_gt': attn_box_gt,
      'attn_ctr_norm_gt': attn_ctr_norm_gt,
      'attn_lg_size_gt': attn_lg_size_gt,
      'gt_knob_prob_box': p_box[0, 0, 0], 'gt_knob_prob_segm': p_segm[0, 0, 0],
  }
  for k in ('y_out', 's_out', 'y_out_patch', 'x_patch', 'attn_box',
            'iou_soft_box_t', 'attn_ctr', 'attn_size', 'attn_top_left',
            'attn_bot_right', 'attn_ctr_norm', 'attn_lg_size',
            'attn_lg_gamma', 'attn_box_lg_gamma', 'y_out_lg_gamma',
            'glimpse_map'):
    outputs[k] = t_to_batch(ys[k])

  new_params = dict(params)
  new_params['ctrl_cnn'] = _write_back_bn(params['ctrl_cnn'], ys['ccnn_bn'])
  new_params['attn_cnn'] = _write_back_bn(params['attn_cnn'], ys['acnn_bn'])
  new_params['attn_dcnn'] = _write_back_bn(params['attn_dcnn'],
                                           ys['adcnn_bn'])
  return outputs, new_params


# ---------------------------------------------------------------------------
# Losses  (ref full_model.py:913-1034)
# ---------------------------------------------------------------------------

def full_model_loss(params, batch, cfg: FullModelConfig, train, key, step,
                    matcher='jax'):
  """Total loss + metrics.  Returns (loss, aux) with aux carrying outputs,
  metrics and the BN-updated params."""
  outputs, new_params = full_model_forward(params, batch, cfg, train, key,
                                           step)
  y_out = outputs['y_out']
  y_gt = outputs['y_gt_trans']
  s_gt = outputs['s_gt']
  s_out = outputs['s_out']
  attn_box = outputs['attn_box']
  attn_box_gt = outputs['attn_box_gt']
  B = y_out.shape[0]
  T = cfg.timespan

  # ---- box loss -------------------------------------------------------
  # Both matchings (box and segmentation) run as ONE batched Hungarian
  # solve: the solver is a vmapped sequential while_loop whose wall time is
  # the max over lanes, so stacking the two [B, T, T] problems to [2B, T, T]
  # costs far less than two separate solves (measured ~10 ms/step at b8,
  # docs/PROFILE_TRAIN.json).
  iou_soft_pairwise = losses.f_iou(y_out, y_gt, pairwise=True)
  if cfg.fixed_order:
    iou_soft_box = losses.f_iou(attn_box, attn_box_gt)          # [B, T]
    match_box = matching.get_identity_match(T, s_gt)
    real_match = matching.f_segm_match(iou_soft_pairwise, s_gt,
                                       matcher=matcher)
  else:
    if cfg.use_knob:
      iou_soft_box = outputs['iou_soft_box_t']                  # [B, T, T]
    else:
      iou_soft_box = losses.f_iou(attn_box, attn_box_gt, pairwise=True)
    both = matching.f_segm_match(
        jnp.concatenate([iou_soft_box, iou_soft_pairwise], axis=0),
        jnp.concatenate([s_gt, s_gt], axis=0), matcher=matcher)
    match_box, real_match = both[:B], both[B:]
  match_box = jax.lax.stop_gradient(match_box)
  real_match = jax.lax.stop_gradient(real_match)

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
    box_loss = -losses.f_weighted_coverage(iou_soft_box, attn_box_gt)
  elif cfg.box_loss_fn == 'bce':
    box_loss = losses.f_match_loss(attn_box, attn_box_gt, match_box,
                                   losses.f_bce)
  else:
    raise ValueError(f'Unknown box_loss_fn: {cfg.box_loss_fn}')

  # ---- segmentation loss ----------------------------------------------
  if cfg.fixed_order:
    iou_soft = losses.f_iou(y_out, y_gt)                        # [B, T]
    match = matching.get_identity_match(T, s_gt)
  else:
    iou_soft = iou_soft_pairwise
    match = real_match
  match_count = jnp.maximum(jnp.sum(match, axis=(1, 2)), 1.0)

  wt_cov_soft = losses.f_weighted_coverage(iou_soft_pairwise, y_gt)
  unwt_cov_soft = losses.f_unweighted_coverage(iou_soft_pairwise, match_count)

  if cfg.fixed_order:
    iou_soft_mask = iou_soft
  else:
    iou_soft_mask = jnp.sum(iou_soft * match, axis=1)
  iou_soft_scalar = jnp.sum(jnp.sum(iou_soft_mask, axis=1) / match_count) / B

  if cfg.segm_loss_fn == 'iou':
    if cfg.segm_weight_alpha > 0.0:
      # Small-instance upweighting (counting lever): per matched GT
      # instance weight area^(-alpha), renormalised to mean 1 over the
      # example's matched instances so the segm/box/conf loss balance is
      # unchanged.  alpha=0 reduces to the uniform reference loss.
      area = jnp.sum(y_gt, axis=(2, 3))                         # [B, M]
      matched = jnp.sum(match, axis=1)                          # [B, M]
      w = matched * jnp.power(area + 1.0, -cfg.segm_weight_alpha)
      w = w * match_count[:, None] / jnp.maximum(
          jnp.sum(w, axis=1, keepdims=True), 1e-6)
      segm_loss = -jnp.sum(
          jnp.sum(w * iou_soft_mask, axis=1) / match_count) / B
    else:
      segm_loss = -iou_soft_scalar
  elif cfg.segm_loss_fn == 'wt_cov':
    segm_loss = -wt_cov_soft
  elif cfg.segm_loss_fn == 'bce':
    segm_loss = losses.f_match_loss(y_out, y_gt, match, losses.f_bce)
  else:
    raise ValueError(f'Unknown segm_loss_fn: {cfg.segm_loss_fn}')

  # ---- confidence loss ------------------------------------------------
  conf_loss = losses.f_conf_loss(s_out, match, use_cum_min=True)

  wd_loss = nn.weight_decay_loss(params, cfg.weight_decay)
  total = box_loss + segm_loss + cfg.loss_mix_ratio * conf_loss + wd_loss

  # ---- hard metrics (ref full_model.py:1059-1097) ---------------------
  y_out_hard = (y_out > 0.5).astype(jnp.float32)
  iou_hard_pair = losses.f_iou(y_out_hard, y_gt, pairwise=True)
  iou_hard_mask = jnp.sum(iou_hard_pair * real_match, axis=1)
  iou_hard = jnp.sum(jnp.sum(iou_hard_mask, axis=1) / match_count) / B
  dice_pair = losses.f_dice(y_out_hard, y_gt, pairwise=True)
  dice = jnp.sum(jnp.sum(dice_pair * real_match, axis=(1, 2))
                 / match_count) / B

  aux = {
      'outputs': outputs,
      'new_params': new_params,
      'loss': total,
      'box_loss': box_loss,
      'segm_loss': segm_loss,
      'conf_loss': conf_loss,
      'wd_loss': wd_loss,
      'iou_soft': iou_soft_scalar,
      'iou_soft_box': iou_soft_box_scalar,
      'iou_hard': iou_hard,
      'dice': dice,
      'wt_cov_soft': wt_cov_soft,
      'unwt_cov_soft': unwt_cov_soft,
      'wt_cov_hard': losses.f_weighted_coverage(iou_hard_pair, y_gt),
      'unwt_cov_hard': losses.f_unweighted_coverage(iou_hard_pair,
                                                    match_count),
      'count_acc': losses.f_count_acc(s_out, s_gt),
      'dic': losses.f_dic(s_out, s_gt),
      'dic_abs': losses.f_dic(s_out, s_gt, abs=True),
      'learn_rate': learn_rate(cfg, step),
      'match': match,
      'match_box': match_box,
  }
  return total, aux
