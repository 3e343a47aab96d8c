"""Checkpoint / resume for differentiable-render optimization loops.

The reference has no checkpointing (its only persistent artifacts are
timestamped output BMPs, /root/reference/src/main.cpp:510-524). cge_tpu
adds gradient-based scene optimization (cge_tpu.diff / parallel.sharding's
train_step_sharded), which makes checkpoint/resume meaningful: this module
persists the optimizable scene-parameter pytree (and any optimizer state)
with orbax, sharded-array aware, so long optimizations survive preemption —
the standard JAX training-loop pattern.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

_STEP_RE = re.compile(r"^step_(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(directory: str, step: int, tree: Any) -> str:
    """Write `tree` (e.g. scene_params(scene) + optimizer state) as
    checkpoint `step_<N>` under `directory`. Returns the checkpoint path."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckpt = _checkpointer()
    ckpt.save(path, tree)
    ckpt.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    """Highest step with a complete checkpoint in `directory` (orbax writes
    atomically via tmp dirs, so presence == complete)."""
    if not os.path.isdir(directory):
        return None
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := _STEP_RE.match(name))]
    return max(steps) if steps else None


def restore(directory: str, step: Optional[int] = None,
            template: Any = None) -> Any:
    """Load checkpoint `step` (default: latest). `template` — a pytree with
    the target structure/shapes/shardings (e.g. the current scene_params) —
    restores arrays with the right placement on multi-device meshes."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckpt = _checkpointer()
    if template is not None:
        return ckpt.restore(path, template)
    return ckpt.restore(path)
