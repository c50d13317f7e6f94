"""Explicit target-backend selection for kernel-path dispatch.

Several ops pick between a Pallas-TPU kernel and a portable XLA fallback.
That choice must be made at TRACE time (it changes the emitted graph), but
``jax.default_backend()`` reflects the process-global default platform —
wrong when the computation is explicitly jitted onto a non-default device
(advisor finding, round 2). ``target_backend()`` adds an explicit override
that callers (tests, shard_map wrappers, multi-backend processes) can set,
either via the ``force_backend`` context manager or the
``GOLIATH_TPU_BACKEND`` env var, falling back to the process default.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

_OVERRIDE: str | None = None


def target_backend() -> str:
    """Backend the kernel-dispatch heuristics should target."""
    if _OVERRIDE is not None:
        return _OVERRIDE
    env = os.environ.get("GOLIATH_TPU_BACKEND")
    if env:
        return env
    return jax.default_backend()


@contextmanager
def force_backend(name: str):
    """Force kernel dispatch to target ``name`` ('tpu' / 'cpu') while
    tracing inside the context, regardless of the process default."""
    global _OVERRIDE
    prev = _OVERRIDE
    _OVERRIDE = name
    try:
        yield
    finally:
        _OVERRIDE = prev
