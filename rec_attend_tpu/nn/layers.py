"""Neural-net layer library: pure functions over named parameter pytrees.

Capability twin of the reference's ``nnlib.py`` layer factories.  The
reference builds stateful TF graphs via closures; here each layer family is
an ``init_*`` (returns a param pytree) plus an ``apply_*`` (pure function),
which composes with jit/vmap/scan/pjit.

Parity-critical details preserved:
  - truncated-normal(0.01) weight init (nnlib.py:54);
  - LSTM forget-gate bias init 1.0, others 0.0 (nnlib.py:544-608);
  - the manual 12-matrix LSTM returning (state, g_i, g_f, g_o)
    (nnlib.py:637-649);
  - per-timestep BatchNorm beta/gamma/EMA copies (nnlib.py:242-249): here a
    leading [T, ...] axis scanned alongside the timestep loop instead of T
    separate variables;
  - BN eval path uses EMA statistics, train path uses batch moments and
    updates EMA with decay 0.9 (nnlib.py:98-119);
  - SAME conv padding, NxN max-pool with SAME padding (nnlib.py:6-25);
  - conv2d_transpose upsampling with skip-channel concat (nnlib.py:339-404).

Weight-decay bookkeeping: layers that carried ``wd`` in the reference mark
their weight matrices in a parallel mask via ``WD_PARAM_NAMES``; the model
computes sum(wd * l2) over masked leaves (ref nnlib.py:59-61).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Parameter leaf names that carry L2 weight decay (conv/mlp/lstm weights,
# never biases or BN params) — ref nnlib.py:59-61 passes wd only for 'w'
# and LSTM weight matrices.
WD_PARAM_NAMES = ('w', 'w_xi', 'w_hi', 'w_xf', 'w_hf', 'w_xu', 'w_hu',
                  'w_xo', 'w_ho')


def trunc_normal(key, shape, stddev=0.01, dtype=jnp.float32):
  """Truncated normal init (ref nnlib.py:54)."""
  return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def conv2d(x, w, stride=1):
  """SAME 2-D convolution, NHWC x HWIO (ref nnlib.py:6-12).

  Weights follow the activation dtype (bf16 activations -> bf16 MXU matmul
  with f32 accumulation via preferred_element_type)."""
  # No explicit preferred_element_type: with both operands cast to the
  # activation dtype the VJP stays dtype-consistent, and the TPU MXU
  # accumulates bf16 matmuls in f32 regardless.
  return jax.lax.conv_general_dilated(
      x, w.astype(x.dtype), window_strides=(stride, stride), padding='SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv2d_transpose(x, w, stride):
  """SAME transposed convolution with output H*stride x W*stride.

  Matches ``tf.nn.conv2d_transpose`` semantics used at nnlib.py:372-376:
  the filter is [F, F, out_ch, in_ch].
  """
  # With transpose_kernel=True the TF-layout [F, F, out, in] filter is
  # exactly the 'HWIO' spec of the corresponding *forward* conv whose
  # gradient this computes.
  return jax.lax.conv_transpose(
      x, w.astype(x.dtype), strides=(stride, stride), padding='SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
      transpose_kernel=True)


def max_pool(x, ratio):
  """N x N max pooling, SAME padding (ref nnlib.py:15-25)."""
  if ratio == 1:
    return x
  return jax.lax.reduce_window(
      x, -jnp.inf, jax.lax.max, (1, ratio, ratio, 1), (1, ratio, ratio, 1),
      'SAME')


def avg_pool(x, ratio):
  if ratio == 1:
    return x
  summed = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, ratio, ratio, 1), (1, ratio, ratio, 1), 'SAME')
  counts = jax.lax.reduce_window(
      jnp.ones_like(x), 0.0, jax.lax.add, (1, ratio, ratio, 1),
      (1, ratio, ratio, 1), 'SAME')
  return summed / counts


def dropout(x, keep_prob, key, train):
  """Dropout active only in training (ref nnlib.py:407-411)."""
  if not train or keep_prob is None or keep_prob >= 1.0:
    return x
  mask = jax.random.bernoulli(key, keep_prob, x.shape)
  return jnp.where(mask, x / keep_prob, 0.0)


# ---------------------------------------------------------------------------
# BatchNorm with per-timestep parameter copies
# ---------------------------------------------------------------------------

BN_EPS = 1e-3        # ref nnlib.py:119
BN_DECAY = 0.9       # ref nnlib.py:103: decay = 1 - 0.1 * phase_train


def init_batch_norm(n_out, num_copies=None):
  """BN params; with ``num_copies`` (the timespan) params get a leading
  [T] axis — the scan-friendly equivalent of the reference's per-timestep
  variable copies (nnlib.py:242-249)."""
  shape = (n_out,) if num_copies is None else (num_copies, n_out)
  return {
      'beta': jnp.zeros(shape),
      'gamma': jnp.ones(shape),
      'ema_mean': jnp.zeros(shape),
      'ema_var': jnp.ones(shape),
  }


def apply_batch_norm(x, bn, train):
  """Normalise over (B, H, W) or (B,) batch dims.

  Args:
    x: [B, H, W, C] or [B, C].
    bn: dict with beta/gamma/ema_mean/ema_var, each [C] (one copy —
      callers slice the [T, C] stack per timestep or pass via scan xs).
    train: python bool.
  Returns:
    (normed, new_bn) — new_bn has updated EMA when training.
  """
  axes = tuple(range(x.ndim - 1))
  in_dtype = x.dtype
  xf = x.astype(jnp.float32)   # moments and EMA always in f32
  if train:
    mean = jnp.mean(xf, axis=axes)
    var = jnp.var(xf, axis=axes)
    new_ema_mean = BN_DECAY * bn['ema_mean'] + (1 - BN_DECAY) * mean
    new_ema_var = BN_DECAY * bn['ema_var'] + (1 - BN_DECAY) * var
    new_bn = dict(bn, ema_mean=new_ema_mean, ema_var=new_ema_var)
  else:
    mean, var = bn['ema_mean'], bn['ema_var']
    new_bn = bn
  inv = jax.lax.rsqrt(var + BN_EPS)
  normed = (xf - mean) * inv * bn['gamma'] + bn['beta']
  return normed.astype(in_dtype), new_bn


# ---------------------------------------------------------------------------
# CNN  (ref nnlib.py:131-257)
# ---------------------------------------------------------------------------

def init_cnn(key, filter_sizes: Sequence[int], channels: Sequence[int],
             use_bn: Sequence[bool], num_bn_copies=None):
  """Params for an N-layer CNN.

  channels has N+1 entries (input depth first), as the reference.
  Returns a list of per-layer dicts {'w','b'[,'bn']}.
  """
  n = len(filter_sizes)
  keys = jax.random.split(key, n)
  layers = []
  for i in range(n):
    layer = {
        'w': trunc_normal(keys[i], (filter_sizes[i], filter_sizes[i],
                                    channels[i], channels[i + 1])),
        'b': trunc_normal(jax.random.fold_in(keys[i], 1), (channels[i + 1],)),
    }
    if use_bn[i]:
      layer['bn'] = init_batch_norm(channels[i + 1], num_bn_copies)
    layers.append(layer)
  return layers


def apply_cnn(params, x, pool: Sequence[int], act: Sequence,
              train: bool, bn_slice=None):
  """Run the CNN; returns (list of per-layer activations, new_params).

  Args:
    bn_slice: when BN params carry a leading [T] axis, a callable
      ``lambda bn: tree`` selecting this timestep's copy (and a matching
      ``bn_update`` is returned for the caller to write back); None means
      params are already single-copy.
  Returns:
    (h_list, new_bn_list) where new_bn_list[i] is the updated single-copy BN
    dict (or None for layers without BN).
  """
  from rec_attend_tpu.parallel.mesh import constrain
  h = x
  h_list = []
  new_bns = []
  for i, layer in enumerate(params):
    h = conv2d(h, layer['w']) + layer['b'].astype(h.dtype)
    h = constrain(h, None, None, None, 'model')   # TP: channels sharded
    if 'bn' in layer:
      bn = bn_slice(layer['bn']) if bn_slice is not None else layer['bn']
      h, new_bn = apply_batch_norm(h, bn, train)
      new_bns.append(new_bn)
    else:
      new_bns.append(None)
    if act[i] is not None:
      h = act[i](h)
    if pool[i] > 1:
      h = max_pool(h, pool[i])
    h_list.append(h)
  return h_list, new_bns


# ---------------------------------------------------------------------------
# DCNN  (ref nnlib.py:260-404)
# ---------------------------------------------------------------------------

def init_dcnn(key, filter_sizes: Sequence[int], channels: Sequence[int],
              use_bn: Sequence[bool], skip_ch=None, num_bn_copies=None):
  """Params for an N-layer transposed-conv net with optional skip concat.

  Filter layout [F, F, out_ch, in_ch(+skip)], matching the reference
  (nnlib.py:320-325)."""
  n = len(filter_sizes)
  keys = jax.random.split(key, n)
  layers = []
  in_ch = channels[0]
  for i in range(n):
    out_ch = channels[i + 1]
    if skip_ch is not None and skip_ch[i]:
      in_ch += skip_ch[i]
    layer = {
        'w': trunc_normal(keys[i], (filter_sizes[i], filter_sizes[i],
                                    out_ch, in_ch)),
        'b': trunc_normal(jax.random.fold_in(keys[i], 1), (out_ch,)),
    }
    if use_bn[i]:
      layer['bn'] = init_batch_norm(out_ch, num_bn_copies)
    layers.append(layer)
    in_ch = out_ch
  return layers


def apply_dcnn(params, x, pool: Sequence[int], act: Sequence, train: bool,
               skip=None, bn_slice=None):
  """Run the DCNN; skip[i] (may be None) is concatenated on the channel axis
  before layer i (ref nnlib.py:362-367)."""
  h = x
  h_list = []
  new_bns = []
  for i, layer in enumerate(params):
    if skip is not None and skip[i] is not None:
      h = jnp.concatenate([h, skip[i]], axis=3)
    h = (conv2d_transpose(h, layer['w'], pool[i])
         + layer['b'].astype(h.dtype))
    if 'bn' in layer:
      bn = bn_slice(layer['bn']) if bn_slice is not None else layer['bn']
      h, new_bn = apply_batch_norm(h, bn, train)
      new_bns.append(new_bn)
    else:
      new_bns.append(None)
    if act[i] is not None:
      h = act[i](h)
    h_list.append(h)
  return h_list, new_bns


# ---------------------------------------------------------------------------
# MLP  (ref nnlib.py:414-495)
# ---------------------------------------------------------------------------

def init_mlp(key, dims: Sequence[int], add_bias=True):
  n = len(dims) - 1
  keys = jax.random.split(key, n)
  layers = []
  for i in range(n):
    layer = {'w': trunc_normal(keys[i], (dims[i], dims[i + 1]))}
    if add_bias:
      layer['b'] = trunc_normal(jax.random.fold_in(keys[i], 1),
                                (dims[i + 1],))
    layers.append(layer)
  return layers


def apply_mlp(params, x, act: Sequence, dropout_keep=None, key=None,
              train=False):
  from rec_attend_tpu.parallel.mesh import constrain
  h = x
  h_list = []
  for i, layer in enumerate(params):
    if dropout_keep is not None and dropout_keep[i] is not None and train:
      key, sub = jax.random.split(key)
      h = dropout(h, dropout_keep[i], sub, train)
    h = jnp.dot(h, layer['w'].astype(h.dtype))
    h = constrain(h, None, 'model')               # TP: features sharded
    if 'b' in layer:
      h = h + layer['b'].astype(h.dtype)
    if act[i] is not None:
      h = act[i](h)
    h_list.append(h)
  return h_list


# ---------------------------------------------------------------------------
# LSTM  (ref nnlib.py:498-651)
# ---------------------------------------------------------------------------

_LSTM_GATES = ('i', 'f', 'u', 'o')


def init_lstm(key, inp_dim, hid_dim):
  """12-matrix LSTM params with the reference's bias inits
  (forget 1.0, others 0.0)."""
  params = {}
  for gi, g in enumerate(_LSTM_GATES):
    k1 = jax.random.fold_in(key, 2 * gi)
    k2 = jax.random.fold_in(key, 2 * gi + 1)
    params[f'w_x{g}'] = trunc_normal(k1, (inp_dim, hid_dim))
    params[f'w_h{g}'] = trunc_normal(k2, (hid_dim, hid_dim))
    params[f'b_{g}'] = (jnp.ones(hid_dim) if g == 'f' else jnp.zeros(hid_dim))
  return params


def apply_lstm(params, inp, state):
  """One LSTM step.

  Args:
    inp: [B, inp_dim]; state: [B, 2*hid_dim] = concat(c, h).
  Returns:
    (new_state, g_i, g_f, g_o) — gate outputs exported for the dashboards,
    as the reference (nnlib.py:637-649).

  The four gate matmuls are fused into one [inp_dim, 4H] contraction for the
  MXU; parameter layout stays 12-matrix for weights.h5 parity.
  """
  hid_dim = params['w_hi'].shape[0]
  c = state[:, :hid_dim]
  h = state[:, hid_dim:]
  w_x = jnp.concatenate([params[f'w_x{g}'] for g in _LSTM_GATES],
                        axis=1).astype(inp.dtype)
  w_h = jnp.concatenate([params[f'w_h{g}'] for g in _LSTM_GATES],
                        axis=1).astype(inp.dtype)
  b = jnp.concatenate([params[f'b_{g}'] for g in _LSTM_GATES])
  from rec_attend_tpu.parallel.mesh import constrain
  z = (jnp.dot(inp, w_x) + jnp.dot(h.astype(inp.dtype), w_h)
       + b).astype(jnp.float32)
  z = constrain(z, None, 'model')                 # TP: 4H gates sharded
  zi, zf, zu, zo = jnp.split(z, 4, axis=1)
  g_i = jax.nn.sigmoid(zi)
  g_f = jax.nn.sigmoid(zf)
  g_o = jax.nn.sigmoid(zo)
  u = jnp.tanh(zu)
  c = g_f * c + g_i * u
  h = g_o * jnp.tanh(c)
  return jnp.concatenate([c, h], axis=1), g_i, g_f, g_o


def init_gru(key, inp_dim, hid_dim):
  """GRU params (ref nnlib.py:654-690; unused by the models but part of the
  layer library surface)."""
  params = {}
  for gi, g in enumerate(('i', 'u', 'r')):
    k1 = jax.random.fold_in(key, 2 * gi)
    k2 = jax.random.fold_in(key, 2 * gi + 1)
    params[f'w_x{g}'] = trunc_normal(k1, (inp_dim, hid_dim))
    params[f'w_h{g}'] = trunc_normal(k2, (hid_dim, hid_dim))
    params[f'b_{g}'] = trunc_normal(jax.random.fold_in(k2, 7), (hid_dim,))
  return params


def apply_gru(params, inp, state):
  g_i = jax.nn.sigmoid(inp @ params['w_xi'] + state @ params['w_hi'] +
                       params['b_i'])
  g_r = jax.nn.sigmoid(inp @ params['w_xr'] + state @ params['w_hr'] +
                       params['b_r'])
  u = jnp.tanh(inp @ params['w_xu'] + g_r * (state @ params['w_hu']) +
               params['b_u'])
  return state * (1 - g_i) + u * g_i


# ---------------------------------------------------------------------------
# Weight decay
# ---------------------------------------------------------------------------

def weight_decay_loss(params, wd):
  """wd * sum over decayed leaves of l2_loss(w) = 0.5*sum(w^2)
  (ref nnlib.py:59-61)."""
  if not wd:
    return 0.0
  total = 0.0
  for path, leaf in jax.tree_util.tree_leaves_with_path(params):
    name = None
    for entry in reversed(path):
      if hasattr(entry, 'key'):
        name = entry.key
        break
      if hasattr(entry, 'name'):
        name = entry.name
        break
    if name in WD_PARAM_NAMES:
      total = total + 0.5 * jnp.sum(jnp.square(leaf))
  return wd * total
