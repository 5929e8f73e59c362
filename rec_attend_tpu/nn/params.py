"""Named-weight export/import in the reference's ``weights.h5`` schema.

The reference chains its three training stages through flat HDF5 weight
files (``box_model_read.py``, ``full_model_read.py``; loaded back at
``full_model.py:271-284`` etc.).  Keys:

  {net}_w_{layer}, {net}_b_{layer}        conv/mlp weights
  {net}_{layer}_{t}_{beta|gamma}          per-timestep BatchNorm affine
  ctrl_lstm_{w_xi|w_hi|b_i|...}           the 12 LSTM matrices

Our in-memory layout stores per-timestep BN as stacked [T, C] arrays;
export unstacks to per-``t`` keys and import restacks, so files are
interchangeable with reference-produced ones.  EMA statistics are exported
under additional ``{net}_{layer}_{t}_{ema_mean|ema_var}`` keys (a superset
the reference ignores).
"""

from __future__ import annotations

import h5py
import jax.numpy as jnp
import numpy as np


def _export_layer_list(h5f, net, layers):
  for i, layer in enumerate(layers):
    h5f[f'{net}_w_{i}'] = np.asarray(layer['w'])
    if 'b' in layer:
      h5f[f'{net}_b_{i}'] = np.asarray(layer['b'])
    if 'bn' in layer:
      bn = layer['bn']
      beta = np.asarray(bn['beta'])
      gamma = np.asarray(bn['gamma'])
      ema_mean = np.asarray(bn['ema_mean'])
      ema_var = np.asarray(bn['ema_var'])
      if beta.ndim == 1:   # single-copy BN: export as copy 0
        beta, gamma = beta[None], gamma[None]
        ema_mean, ema_var = ema_mean[None], ema_var[None]
      for t in range(beta.shape[0]):
        h5f[f'{net}_{i}_{t}_beta'] = beta[t]
        h5f[f'{net}_{i}_{t}_gamma'] = gamma[t]
        h5f[f'{net}_{i}_{t}_ema_mean'] = ema_mean[t]
        h5f[f'{net}_{i}_{t}_ema_var'] = ema_var[t]


def export_weights_h5(params: dict, path: str):
  """Write a params pytree to a reference-schema weights.h5.

  params maps net name -> layer list (cnn/dcnn/mlp) or dict (lstm)."""
  with h5py.File(path, 'w') as h5f:
    for net, value in params.items():
      if isinstance(value, dict):       # lstm-style flat dict
        for k, v in value.items():
          h5f[f'{net}_{k}'] = np.asarray(v)
      else:
        _export_layer_list(h5f, net, value)


def _detect_nlayers(h5f, net):
  n = 0
  while f'{net}_w_{n}' in h5f:
    n += 1
  return n


def _detect_ncopies(h5f, net, layer):
  t = 0
  while f'{net}_{layer}_{t}_beta' in h5f:
    t += 1
  return t


def load_net_h5(path: str, net: str, cnn_prefix_sniff=False):
  """Load one net's layers from a weights.h5.

  Returns a list of layer dicts {'w','b'[,'bn']} with per-timestep BN
  restacked to [T, C], or a flat dict for ``*_lstm`` nets; None when the
  net is absent.

  With ``cnn_prefix_sniff`` the reference's flexible prefix logic
  (box_model.py:184-219) is applied: try ``attn_``, then bare, then
  ``ctrl_`` prefixed cnn keys.
  """
  with h5py.File(path, 'r') as h5f:
    if cnn_prefix_sniff:
      for prefix in ('attn_', '', 'ctrl_'):
        if f'{prefix}cnn_w_0' in h5f:
          net = f'{prefix}cnn'
          break
    if net.endswith('lstm'):
      keys = ['w_xi', 'w_hi', 'b_i', 'w_xf', 'w_hf', 'b_f', 'w_xu', 'w_hu',
              'b_u', 'w_xo', 'w_ho', 'b_o']
      if f'{net}_{keys[0]}' not in h5f:
        return None
      return {k: jnp.asarray(h5f[f'{net}_{k}'][:]) for k in keys}
    n = _detect_nlayers(h5f, net)
    if n == 0:
      return None
    layers = []
    for i in range(n):
      layer = {'w': jnp.asarray(h5f[f'{net}_w_{i}'][:])}
      if f'{net}_b_{i}' in h5f:
        layer['b'] = jnp.asarray(h5f[f'{net}_b_{i}'][:])
      t = _detect_ncopies(h5f, net, i)
      if t > 0:
        bn = {
            'beta': jnp.stack(
                [jnp.asarray(h5f[f'{net}_{i}_{tt}_beta'][:])
                 for tt in range(t)]),
            'gamma': jnp.stack(
                [jnp.asarray(h5f[f'{net}_{i}_{tt}_gamma'][:])
                 for tt in range(t)]),
        }
        if f'{net}_{i}_0_ema_mean' in h5f:
          bn['ema_mean'] = jnp.stack(
              [jnp.asarray(h5f[f'{net}_{i}_{tt}_ema_mean'][:])
               for tt in range(t)])
          bn['ema_var'] = jnp.stack(
              [jnp.asarray(h5f[f'{net}_{i}_{tt}_ema_var'][:])
               for tt in range(t)])
        else:   # reference files carry only beta/gamma
          bn['ema_mean'] = jnp.zeros_like(bn['beta'])
          bn['ema_var'] = jnp.ones_like(bn['gamma'])
        if t == 1:
          bn = {k: v[0] for k, v in bn.items()}
        layer['bn'] = bn
      layers.append(layer)
    return layers


def merge_pretrained(init_layers, loaded_layers, timespan=None):
  """Overlay loaded layers onto freshly-initialised ones (partial nets
  allowed, as box_model.py:207-219: missing tail layers stay random)."""
  if loaded_layers is None:
    return init_layers
  out = []
  for i, init_layer in enumerate(init_layers):
    if i < len(loaded_layers):
      loaded = dict(loaded_layers[i])
      if 'bn' in init_layer and 'bn' in loaded:
        want = init_layer['bn']['beta'].shape
        have = loaded['bn']['beta'].shape
        if want != have and timespan is not None and len(want) == 2:
          # broadcast a single BN copy across timesteps
          loaded['bn'] = {k: jnp.broadcast_to(v[-1] if v.ndim == 2 else v,
                                              want)
                          for k, v in loaded['bn'].items()}
      elif 'bn' in init_layer and 'bn' not in loaded:
        loaded['bn'] = init_layer['bn']
      out.append(loaded)
    else:
      out.append(init_layer)
  return out
