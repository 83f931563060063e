"""Checkpoint / resume for flow params, optimizer state, and sampler chains.

The reference has no checkpointing beyond torch ``state_dict`` buffers and
the replay buffer's HDF5 snapshots (SURVEY.md section 5); here training and
sampling state persist via orbax (params, opt state, RNG keys, chain
states, step counters — any pytree).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any, max_to_keep: int = 3) -> None:
    """Save a pytree ``state`` (params / opt_state / sampler state / keys).

    ``force=True`` below matters: orbax's ``CheckpointManager.save`` silently
    no-ops when ``step`` is <= the directory's latest existing step (its
    preemption-resume semantics).  A caller retraining into a directory that
    already holds an older run's later-step checkpoint would otherwise lose
    the new parameters without any error.  ``save_checkpoint`` is an explicit
    request, so it always writes.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    if step in (mgr.all_steps() or ()):
        # explicit re-save of an existing step = overwrite (e.g. the trainer
        # saving its final step right after an interval save landed there)
        mgr.delete(step)
    saved = mgr.save(step, args=ocp.args.StandardSave(state), force=True)
    mgr.wait_until_finished()
    mgr.close()
    if not saved:
        raise RuntimeError(f"orbax refused to save step {step} into {directory}")


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Any = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``template``: a pytree with the target structure/shardings; restored
    arrays match its sharding (pass your freshly initialized state to
    restore directly onto a mesh).
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    if template is not None:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        try:
            restored = mgr.restore(step)
        except ValueError:
            # The checkpoint's sharding metadata references devices that do
            # not exist here (e.g. saved on TPU, restored on CPU).  Rebuild
            # an abstract template from the stored shapes/dtypes so orbax
            # places the arrays on the current default device instead.
            meta = mgr.item_metadata(step)
            here = jax.sharding.SingleDeviceSharding(jax.devices()[0])

            def as_abstract(m):
                shape = getattr(m, "shape", None)
                dtype = getattr(m, "dtype", None)
                if shape is None or dtype is None:
                    return m
                return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=here)

            template = jax.tree_util.tree_map(as_abstract, meta)
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
