"""Crash-safe directory replacement, shared by every table-commit path.

One protocol, one recovery rule (review finding: three hand-rolled copies
of the rename dance had divergent crash-window behavior):

- ``atomic_replace(path, write_fn)``: write the replacement to
  ``path.__new`` via ``write_fn``, move the live dir to ``path.__old``,
  rename the new one in, drop the old copy.  At every instant a complete
  table exists at ``path`` or ``path.__old``.
- ``heal(path)``: if a previous writer died between the two renames
  (live missing, ``.__old`` present), rename the old copy back.  Every
  reader/writer entry point calls this first, so the crash window
  self-repairs on the next touch instead of requiring manual recovery.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def heal(path: str) -> bool:
    """Restore ``path`` from its ``.__old`` sibling if a crash left the
    live directory missing.  Returns True if a restore happened."""
    old = path + ".__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        return True
    return False


def atomic_replace(path: str, write_fn: Callable[[str], None]) -> None:
    """Replace the directory at ``path`` with whatever ``write_fn(tmp)``
    writes, crash-safely (see module docstring).  ``path`` need not exist
    yet (first write)."""
    heal(path)
    tmp, old = path + ".__new", path + ".__old"
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
