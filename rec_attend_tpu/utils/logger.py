"""Singleton colour console/file logger.

Capability twin of the reference's ``utils/logger.py:47-251``: per-call
caller ``file:line`` introspection, a VERBOSE environment threshold, optional
file tee, and ``fatal`` that exits.  Implementation is a thin layer over the
stdlib instead of a hand-rolled formatter.
"""

from __future__ import annotations

import datetime
import inspect
import os
import sys
import threading

_TERM_COLOURS = {
    'debug': '\033[0m',
    'info': '\033[92m',
    'warning': '\033[93m',
    'error': '\033[91m',
    'fatal': '\033[91m',
}
_LEVELS = {'debug': 0, 'info': 1, 'warning': 2, 'error': 3, 'fatal': 4}

_lock = threading.Lock()
_default_logger = None


class Logger:

  def __init__(self, filename: str | None = None, default_verbose: int = 0):
    self.filename = filename
    try:
      self.verbose_thresh = int(os.environ.get('VERBOSE', default_verbose))
    except ValueError:
      self.verbose_thresh = default_verbose
    if filename is not None:
      os.makedirs(os.path.dirname(filename) or '.', exist_ok=True)

  def _caller(self):
    frame = inspect.currentframe()
    # walk out of logger frames
    while frame and frame.f_code.co_filename == __file__:
      frame = frame.f_back
    if frame is None:
      return '?', 0
    return os.path.basename(frame.f_code.co_filename), frame.f_lineno

  def log(self, message, typ='info', verbose=0):
    if verbose > self.verbose_thresh:
      return
    fname, lineno = self._caller()
    now = datetime.datetime.now().strftime('%Y-%m-%d %H:%M:%S')
    prefix = f'{typ.upper()[:5]:5s} {now} {fname}:{lineno}'
    line = f'{prefix} {message}'
    with _lock:
      colour = _TERM_COLOURS.get(typ, '')
      sys.stderr.write(f'{colour}{line}\033[0m\n')
      if self.filename is not None:
        with open(self.filename, 'a') as f:
          f.write(line + '\n')

  def debug(self, m, verbose=2):
    self.log(m, 'debug', verbose)

  def info(self, m, verbose=0):
    self.log(m, 'info', verbose)

  def warning(self, m, verbose=0):
    self.log(m, 'warning', verbose)

  def error(self, m, verbose=0):
    self.log(m, 'error', verbose)

  def fatal(self, m):
    self.log(m, 'fatal')
    sys.exit(1)

  def log_args(self):
    self.info('Command: {}'.format(' '.join(sys.argv)))


def get(filename: str | None = None) -> Logger:
  """Return the singleton logger (first call may attach a file)."""
  global _default_logger
  with _lock:
    if _default_logger is None or (filename is not None
                                   and _default_logger.filename is None):
      _default_logger = Logger(filename)
  return _default_logger
