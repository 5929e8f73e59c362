"""Checkpoint save/restore.

Capability twin of the reference's ``utils/saver.py:12-93``: the experiment
folder is ``results/<model_id>`` holding numbered checkpoints (keep last 2),
``model_opt.yaml`` + ``data_opt.yaml`` snapshots, and latest-checkpoint
discovery by filename step parse.  Checkpoints store the params/opt_state
pytree as an .npz of flattened leaves (portable, no orbax server deps);
the cross-model ``weights.h5`` export lives in ``nn/params.py``.
"""

from __future__ import annotations

import os
import re

import numpy as np
import yaml

import jax

from rec_attend_tpu.utils import logger

CKPT_RE = re.compile(r'ckpt-(\d+)\.npz$')


def _flatten_with_paths(tree):
  flat, treedef = jax.tree_util.tree_flatten(tree)
  return flat, treedef


def save_pytree(path, tree):
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  np.savez(path, num_leaves=len(leaves),
           **{f'leaf_{i}': np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path, like):
  """Load leaves saved by save_pytree into the structure of ``like``."""
  leaves, treedef = jax.tree_util.tree_flatten(like)
  with np.load(path) as data:
    n = int(data['num_leaves'])
    if n != len(leaves):
      raise ValueError(
          f'Checkpoint has {n} leaves; template has {len(leaves)}')
    new_leaves = [data[f'leaf_{i}'] for i in range(n)]
  return jax.tree_util.tree_unflatten(treedef, new_leaves)


class Saver:

  def __init__(self, folder, model_opt=None, data_opt=None, max_to_keep=2):
    self.folder = folder
    self.log = logger.get()
    self.max_to_keep = max_to_keep
    os.makedirs(folder, exist_ok=True)
    if model_opt is not None:
      self.save_opt_dict('model_opt.yaml', model_opt)
    if data_opt is not None:
      self.save_opt_dict('data_opt.yaml', data_opt)

  def save_opt_dict(self, name, opt):
    if hasattr(opt, 'to_dict'):
      opt = opt.to_dict()
    with open(os.path.join(self.folder, name), 'w') as f:
      yaml.safe_dump(opt, f, default_flow_style=False)

  def load_opt_dict(self, name):
    path = os.path.join(self.folder, name)
    if not os.path.exists(path):
      return None
    with open(path) as f:
      return yaml.safe_load(f)

  def save(self, tree, step):
    """Save a checkpoint at ``step`` and prune old ones."""
    path = os.path.join(self.folder, f'ckpt-{step}.npz')
    save_pytree(path, tree)
    self.log.info(f'Saved checkpoint {path}')
    ckpts = self.list_ckpts()
    for s, p in ckpts[:-self.max_to_keep]:
      os.remove(p)
    return path

  def list_ckpts(self):
    out = []
    for f in os.listdir(self.folder):
      m = CKPT_RE.search(f)
      if m:
        out.append((int(m.group(1)), os.path.join(self.folder, f)))
    return sorted(out)

  def get_latest_ckpt(self):
    """Returns (step, path) or None."""
    ckpts = self.list_ckpts()
    return ckpts[-1] if ckpts else None

  def restore(self, like, step=None):
    """Restore the checkpoint at ``step`` (default latest) into the
    structure of ``like``.  Returns (tree, step)."""
    if step is None:
      latest = self.get_latest_ckpt()
      if latest is None:
        raise FileNotFoundError(f'No checkpoint in {self.folder}')
      step, path = latest
    else:
      path = os.path.join(self.folder, f'ckpt-{step}.npz')
    tree = load_pytree(path, like)
    self.log.info(f'Restored checkpoint {path}')
    return tree, step
