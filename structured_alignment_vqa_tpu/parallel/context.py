"""Ambient mesh context.

Modules that need to open a ``shard_map`` region inside the jitted model
(ring attention, `ops/ring_attention.py`) fetch the active mesh from here —
flax module fields can't carry a Mesh through config dataclasses cleanly, and
threading it through every ``__call__`` would contaminate the reference's
call-signature parity. The driver (or a test) wraps its step calls in
:func:`use_mesh`; tracing picks the mesh up and bakes it into the jaxpr.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from jax.sharding import Mesh

_state = threading.local()


def current_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = current_mesh()
    _state.mesh = mesh
    try:
        yield mesh
    finally:
        _state.mesh = prev
