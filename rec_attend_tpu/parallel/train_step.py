"""Jitted (and optionally mesh-sharded) train/eval step builders.

Replaces the reference's per-step ``sess.run([loss, train_step], feed_dict)``
host loop (runner.py:49-105) with one donated, jit-compiled function:
forward + Hungarian matching + losses + grads + Adam + BN-EMA writeback all
execute on device; the host only feeds batches and schedules cadences.

Optimisation matches full_model.py:1036-1057: Adam(eps=1e-7) on a staircase
exponential-decay LR with per-element gradient clipping to ±clip_gradient,
plus frozen-subtree masking (the reference's trainable=False variables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from rec_attend_tpu.models.full_model import learn_rate

import numpy as np

# Batch arrays transferred host->device as quantized uint8 (PNG-sourced
# images and binary/PNG-encoded soft masks round-trip exactly).  At CVPPP
# shapes the dense f32 y_gt alone is 34 MB/step — 4x smaller on the wire
# matters when the chip sits behind a network tunnel, and costs one
# multiply on device.
QUANTIZED_KEYS = ('x', 'y_gt', 'c_gt', 'd_gt', 'y_in', 'd_in')


def encode_batch(batch):
  """Quantize eligible float [0,1] arrays to uint8 on the host."""
  out = {}
  for k, v in batch.items():
    if (k in QUANTIZED_KEYS and hasattr(v, 'dtype')
        and np.issubdtype(np.asarray(v).dtype, np.floating)):
      out[k] = np.round(np.asarray(v) * 255.0).astype(np.uint8)
    else:
      out[k] = v
  return out


def decode_batch(batch):
  """In-jit inverse of ``encode_batch``: uint8 -> f32 / 255.  Idempotent —
  float inputs pass through, so un-encoded callers keep working."""
  return {k: (v.astype(jnp.float32) / 255.0
              if hasattr(v, 'dtype') and v.dtype == jnp.uint8 else v)
          for k, v in batch.items()}


def make_optimizer(cfg):
  """optax chain mirroring the reference optimiser semantics."""
  sched = lambda count: learn_rate(cfg, count)
  if getattr(cfg, 'optimizer', 'adam') == 'momentum':
    opt = optax.sgd(learning_rate=sched, momentum=0.9)
  else:
    opt = optax.adam(learning_rate=sched, eps=1e-7)
  return optax.chain(optax.clip(cfg.clip_gradient) if hasattr(
      cfg, 'clip_gradient') else optax.identity(), opt)


def _apply_freeze(updates, freeze):
  if freeze is None:
    return updates
  return jax.tree_util.tree_map(
      lambda u, f: jnp.zeros_like(u) if f else u, updates, freeze)


def _write_back_ema(params, new_params):
  """Copy EMA statistics (non-trainable state) from the forward pass."""
  def merge(p, n):
    return n if isinstance(n, jax.Array) else p

  def walk(p, n):
    if isinstance(p, dict):
      out = {}
      for k, v in p.items():
        if k in ('ema_mean', 'ema_var'):
          out[k] = n[k]
        else:
          out[k] = walk(v, n[k])
      return out
    if isinstance(p, list):
      return [walk(a, b) for a, b in zip(p, n)]
    return p

  return walk(params, new_params)


def make_train_step(loss_fn, cfg, freeze=None, mesh=None, donate=True,
                    jit=True):
  """Build ``step(params, opt_state, batch, key, step) ->
  (params, opt_state, metrics)``.

  Args:
    loss_fn: model loss ``(params, batch, cfg, train, key, step) ->
      (loss, aux)`` with aux['new_params'] carrying BN EMA updates.
    freeze: optional pytree of bools (True = no update).
    mesh: optional jax.sharding.Mesh; batch sharded on 'data', params
      replicated (XLA inserts the gradient all-reduce over ICI).
  """
  tx = make_optimizer(cfg)

  def step_fn(params, opt_state, batch, key, step):
    batch = decode_batch(batch)

    def lf(p):
      return loss_fn(p, batch, cfg, True, key, step)

    (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = _apply_freeze(updates, freeze)
    params = optax.apply_updates(params, updates)
    params = _write_back_ema(params, aux['new_params'])
    metrics = {k: v for k, v in aux.items()
               if k not in ('outputs', 'new_params', 'match', 'match_box')}
    return params, opt_state, metrics

  if not jit:
    return step_fn, tx

  if mesh is not None:
    from rec_attend_tpu.parallel import mesh as mesh_lib
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)
    step_fn = jax.jit(
        step_fn,
        in_shardings=(repl, repl, bsh, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else ())
  else:
    step_fn = jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())
  return step_fn, tx


def make_eval_step(loss_fn, cfg, mesh=None, with_outputs=False):
  """Build ``eval_step(params, batch, key) -> metrics[+outputs]``."""

  def step_fn(params, batch, key):
    batch = decode_batch(batch)
    loss, aux = loss_fn(params, batch, cfg, False, key, 0)
    metrics = {k: v for k, v in aux.items()
               if k not in ('outputs', 'new_params', 'match', 'match_box')}
    if with_outputs:
      return metrics, aux['outputs']
    return metrics

  if mesh is not None:
    from rec_attend_tpu.parallel import mesh as mesh_lib
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)
    out_sh = (repl, bsh) if with_outputs else repl
    step_fn = jax.jit(step_fn, in_shardings=(repl, bsh, repl),
                      out_shardings=out_sh)
  else:
    step_fn = jax.jit(step_fn)
  return step_fn


def make_forward_fn(forward, cfg, mesh=None):
  """Build a jitted inference ``fn(params, batch, key) -> outputs``."""

  def fwd(params, batch, key):
    outputs, _ = forward(params, decode_batch(batch), cfg, False, key)
    return outputs

  if mesh is not None:
    from rec_attend_tpu.parallel import mesh as mesh_lib
    repl = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh)
    return jax.jit(fwd, in_shardings=(repl, bsh, repl), out_shardings=bsh)
  return jax.jit(fwd)
