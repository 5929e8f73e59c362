"""On-device batched image augmentation.

Capability twin of the reference's ``image_ops.py:9-180``: pad -> random
crop -> random flip/transpose -> random hue/saturation/brightness/contrast,
with a centre-crop eval path blended by the train flag so one jitted graph
serves both modes.  RNG is explicit (JAX keys) instead of graph-level seeds.

The reference applies *one* crop offset / flip draw per batch (its
``tf.random_uniform([2])`` is shared across examples); we keep that
semantics — it composes with data-parallel sharding since each device draws
from its own fold of the key.

Hue/saturation run in an RGB<->HSV roundtrip implemented here (the reference
used TF's adjust_hue/adjust_saturation kernels, image_ops.py:128-180).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb):
  """[..., 3] in [0, 1] -> HSV in [0, 1]."""
  r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
  maxc = jnp.maximum(jnp.maximum(r, g), b)
  minc = jnp.minimum(jnp.minimum(r, g), b)
  v = maxc
  delta = maxc - minc
  safe_delta = jnp.where(delta > 0, delta, 1.0)
  s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
  rc = (maxc - r) / safe_delta
  gc = (maxc - g) / safe_delta
  bc = (maxc - b) / safe_delta
  h = jnp.where(r == maxc, bc - gc,
                jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
  h = (h / 6.0) % 1.0
  h = jnp.where(delta > 0, h, 0.0)
  return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
  h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
  i = jnp.floor(h * 6.0)
  f = h * 6.0 - i
  p = v * (1.0 - s)
  q = v * (1.0 - s * f)
  t = v * (1.0 - s * (1.0 - f))
  i = i.astype(jnp.int32) % 6
  r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [v, q, p, p, t, v])
  g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [t, v, v, q, p, p])
  b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [p, p, t, v, v, q])
  return jnp.stack([r, g, b], axis=-1)


def adjust_hue(image, delta):
  hsv = rgb_to_hsv(image)
  h = (hsv[..., 0] + delta) % 1.0
  return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def adjust_saturation(image, factor):
  hsv = rgb_to_hsv(image)
  s = jnp.clip(hsv[..., 1] * factor, 0.0, 1.0)
  return hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))


def adjust_brightness(image, delta):
  return image + delta


def adjust_contrast(image, factor):
  mean = jnp.mean(image, axis=(-3, -2), keepdims=True)
  return (image - mean) * factor + mean


def random_transformation(key, x, padding, train, rnd_hflip=True,
                          rnd_vflip=True, rnd_transpose=True,
                          rnd_colour=False, y=None, d=None, c=None):
  """Random crop/flip/transpose/colour augmentation of a batch.

  Args:
    key: PRNG key.
    x: [B, H, W, 3] image.
    padding: int pad amount; crop offset is drawn in [0, 2*padding).
    train: python bool — False selects the deterministic centre crop
      (the reference blended both paths with a phase_train float;
      jit specialises per mode instead, which XLA prefers).
    y: [B, T, H, W] instance masks (transformed consistently).
    d: [B, H, W, 8] orientation one-hots (disables flips, as reference).
    c: [B, H, W, C] semantic masks.
  Returns:
    dict with transformed 'x' (+ 'y', 'd', 'c' when given).
  """
  if d is not None:
    assert not rnd_vflip and not rnd_hflip and not rnd_transpose, (
        'Orientation mode is on, no random flips/transpose '
        '(ref image_ops.py:41-44)')
  if rnd_transpose:
    assert x.shape[1] == x.shape[2], (
        'rnd_transpose needs a square image (only the CVPPP preset '
        'enables it, ref cmd_args_parser.py:66-70)')

  h, w = x.shape[1], x.shape[2]
  pad_x = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
  x_pad = jnp.pad(x, pad_x)
  y_pad = (jnp.pad(y, [(0, 0), (0, 0), (padding, padding),
                       (padding, padding)]) if y is not None else None)
  d_pad = jnp.pad(d, pad_x) if d is not None else None
  c_pad = jnp.pad(c, pad_x) if c is not None else None

  if not train:
    off = (padding, padding)
    results = {'x': jax.lax.dynamic_slice(
        x_pad, (0, off[0], off[1], 0), x.shape)}
    if y is not None:
      results['y'] = jax.lax.dynamic_slice(
          y_pad, (0, 0, off[0], off[1]), y.shape)
    if d is not None:
      results['d'] = jax.lax.dynamic_slice(
          d_pad, (0, off[0], off[1], 0), d.shape)
    if c is not None:
      results['c'] = jax.lax.dynamic_slice(
          c_pad, (0, off[0], off[1], 0), c.shape)
    return results

  k_off, k_h, k_v, k_t, k_hue, k_sat, k_bri, k_con = jax.random.split(key, 8)
  off = jax.random.randint(k_off, (2,), 0, max(2 * padding, 1))

  x_out = jax.lax.dynamic_slice(x_pad, (0, off[0], off[1], 0), x.shape)
  y_out = (jax.lax.dynamic_slice(y_pad, (0, 0, off[0], off[1]), y.shape)
           if y is not None else None)
  d_out = (jax.lax.dynamic_slice(d_pad, (0, off[0], off[1], 0), d.shape)
           if d is not None else None)
  c_out = (jax.lax.dynamic_slice(c_pad, (0, off[0], off[1], 0), c.shape)
           if c is not None else None)

  if d is None:
    # Flips: one Bernoulli draw per batch, as the reference
    # (image_ops.py:84-96).
    do_h = rnd_hflip and jax.random.uniform(k_h) < 0.5
    do_v = rnd_vflip and jax.random.uniform(k_v) < 0.5
    do_t = rnd_transpose and jax.random.uniform(k_t) < 0.5

    def flip(v, axis_img, axis_msk, do):
      nonlocal x_out, y_out
      x_new = jnp.flip(x_out, axis=axis_img)
      x_out = jnp.where(do, x_new, x_out)
      if y_out is not None:
        y_new = jnp.flip(y_out, axis=axis_msk)
        y_out = jnp.where(do, y_new, y_out)

    if rnd_hflip:
      flip('h', 2, 3, do_h)
    if rnd_vflip:
      flip('v', 1, 2, do_v)
    if rnd_transpose:
      x_tr = jnp.transpose(x_out, (0, 2, 1, 3))
      x_out = jnp.where(do_t, x_tr, x_out)
      if y_out is not None:
        y_tr = jnp.transpose(y_out, (0, 1, 3, 2))
        y_out = jnp.where(do_t, y_tr, y_out)

  if rnd_colour:
    x_out = adjust_hue(x_out, jax.random.uniform(k_hue, (), minval=-0.1,
                                                 maxval=0.1))
    x_out = adjust_saturation(x_out, jax.random.uniform(
        k_sat, (), minval=0.9, maxval=1.1))
    x_out = adjust_brightness(x_out, jax.random.uniform(
        k_bri, (), minval=-0.1, maxval=0.1))
    x_out = adjust_contrast(x_out, jax.random.uniform(
        k_con, (), minval=0.9, maxval=1.1))

  results = {'x': x_out}
  if y is not None:
    results['y'] = y_out
  if d is not None:
    results['d'] = d_out
  if c is not None:
    results['c'] = c_out
  return results
