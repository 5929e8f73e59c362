"""Dashboard asset catalog.

Capability twin of the reference's ``utils/log_manager.py`` +
``utils/lazy_registerer.py``: a ``catalog`` file in the logs folder listing
registered CSVs/images/plain files for the deep-dashboard web viewer, plus
lazy registration so plot files are catalogued on first write.
"""

from __future__ import annotations

import os
import threading


class LogManager:

  def __init__(self, folder):
    self.folder = folder
    self._lock = threading.Lock()
    self._registered = {}
    os.makedirs(folder, exist_ok=True)
    self.catalog = os.path.join(folder, 'catalog')
    with open(self.catalog, 'w') as f:
      f.write('filename,type,name\n')

  def register(self, filename, typ, name):
    base = os.path.basename(filename)
    with self._lock:
      if base in self._registered:
        return
      self._registered[base] = (typ, name)
      with open(self.catalog, 'a') as f:
        f.write(f'{base},{typ},{name}\n')


class LazyRegisterer:
  """Defers catalog registration until the asset file exists."""

  def __init__(self, log_manager, filename, typ, name):
    self.log_manager = log_manager
    self.filename = filename
    self.typ = typ
    self.name = name
    self._done = False

  def is_registered(self):
    return self._done

  def register(self):
    if not self._done and os.path.exists(self.filename):
      self.log_manager.register(self.filename, self.typ, self.name)
      self._done = True

  def get_fname(self):
    return self.filename
