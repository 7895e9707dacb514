"""Checkpointing: orbax for full train state (params + optimizer + step — the
reference saves only the model state dict, train.py:134-136), plus a plain
msgpack fallback for parameter-only saves and the torch-checkpoint converter
entry point (droid.py:46-60)."""

from __future__ import annotations

import os
from typing import Any, Dict

from flax import serialization


def save_params(path: str, params) -> None:
    """Parameter-only checkpoint (msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template=None):
    with open(path, "rb") as f:
        data = f.read()
    if template is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(template, data)


def save_train_state(path: str, state: Dict[str, Any],
                     overwrite: bool = False) -> None:
    """Full resumable train state via orbax (params + opt_state + step) —
    a capability the reference lacks (no optimizer/step resume, SURVEY §5).

    In multi-process mode this is a COLLECTIVE: every process must call it
    (orbax runs sync_global_processes barriers; process 0 writes).
    ``overwrite``: a RESUMED run legitimately re-reaches a step whose state
    dir already exists (orbax otherwise raises 'Destination ... already
    exists' and kills the session at its next state save). Scoped to resumes
    only — a fresh run that collides with a different earlier run's dir
    should fail loudly, not silently clobber it."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=overwrite)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
