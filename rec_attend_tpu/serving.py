"""Inference/serving API: checkpoint -> batched instance predictions.

The reference has no serving surface (its only inference paths are the
eval/pack scripts, full_model_eval.py:97-145); this module packages the same
forward + postprocess chain behind one object for deployment:

    seg = InstanceSegmenter.from_checkpoint('results/full_model_...')
    result = seg.predict(images)            # [B, H, W, 3] float in [0,1]
    result['masks']   # [B, T, H, W] binary instance masks
    result['scores']  # [B, T] stop-confidence per slot
    result['counts']  # [B] predicted instance counts

Device execution is one jitted forward (donating nothing, params stay
resident); host postprocess mirrors the eval CLI chain
(confidence -> one-label -> threshold -> remove-tiny).  Padding/resizing to
the model's static input shape is handled here so callers can pass
arbitrary image sizes.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from rec_attend_tpu import config as C
from rec_attend_tpu.utils import postprocess as pp


class InstanceSegmenter:
  """Batched recurrent-attention instance segmentation service."""

  def __init__(self, params, cfg, threshold=0.5, remove_tiny=16,
               conf_threshold=0.5):
    from rec_attend_tpu.models import full_model
    self.cfg = cfg.replace(use_knob=False)
    self.params = params
    self.threshold = threshold
    self.remove_tiny = remove_tiny
    self.conf_threshold = conf_threshold
    t, h, w = cfg.timespan, cfg.inp_height, cfg.inp_width

    def fwd(params, x, key):
      batch = {'x': x,
               'y_gt': jnp.zeros((x.shape[0], t, h, w), jnp.float32),
               's_gt': jnp.zeros((x.shape[0], t), jnp.float32)}
      outputs, _ = full_model.full_model_forward(params, batch, self.cfg,
                                                 train=False, key=key)
      return outputs['y_out'], outputs['s_out']

    self._fwd = jax.jit(fwd)
    self._key = jax.random.PRNGKey(0)

  @classmethod
  def from_checkpoint(cls, folder, **kw):
    """Load params + config from a training results folder."""
    import yaml
    from rec_attend_tpu.engine.saver import Saver
    from rec_attend_tpu.models import full_model
    with open(os.path.join(folder, 'model_opt.yaml')) as f:
      cfg = C.FullModelConfig.from_dict(yaml.safe_load(f))
    saver = Saver(folder)
    params = full_model.init_full_model(jax.random.PRNGKey(0), cfg)
    try:
      from rec_attend_tpu.parallel.train_step import make_optimizer
      tx = make_optimizer(cfg)
      tree = {'params': params, 'opt_state': tx.init(params)}
      loaded, _ = saver.restore(tree)
    except ValueError:
      loaded, _ = saver.restore({'params': params})
    return cls(loaded['params'], cfg, **kw)

  def _prepare(self, images):
    """Resize arbitrary-size [B, H, W, 3] inputs to the model shape."""
    import cv2
    h, w = self.cfg.inp_height, self.cfg.inp_width
    images = np.asarray(images, np.float32)
    if images.ndim == 3:
      images = images[None]
    if images.max() > 1.5:      # uint8-style range
      images = images / 255.0
    orig = images.shape[1:3]
    if orig != (h, w):
      images = np.stack([cv2.resize(im, (w, h)) for im in images])
    return jnp.asarray(images), orig

  def predict(self, images, full_size=True):
    """Segment instances.  Returns dict with 'masks' [B,T,h,w] uint8,
    'soft_masks' float, 'scores' [B,T], 'counts' [B]."""
    x, orig = self._prepare(images)
    self._key, k = jax.random.split(self._key)
    y_out, s_out = self._fwd(self.params, x, k)
    y_out = np.asarray(y_out)
    s_out = np.asarray(s_out)

    # Postprocess chain (ref full_model_eval.py:97-145).
    y, conf = pp.apply_confidence(y_out, s_out)
    y = pp.apply_one_label(y)           # list of [T, h, w]
    if full_size and orig != (self.cfg.inp_height, self.cfg.inp_width):
      y = pp.upsample(y, [np.zeros((y_out.shape[1],) + orig)
                          for _ in range(y_out.shape[0])])
    masks = pp.apply_threshold(y, self.threshold)
    if self.remove_tiny:
      masks, conf = pp.remove_tiny(masks, conf,
                                   threshold=self.remove_tiny)
    masks = np.stack(masks)
    counts = conf.sum(axis=1).astype(np.int32)
    return {'masks': masks.astype(np.uint8), 'soft_masks': np.stack(y),
            'scores': s_out, 'counts': counts}
