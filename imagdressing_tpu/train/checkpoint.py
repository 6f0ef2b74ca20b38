"""Orbax checkpointing for the sharded train state.

Replaces the reference's DeepSpeed `model.save_checkpoint(folder, ckpt_id,
{epoch, last_global_step})` / `load_checkpoint` pair
(/root/reference/train.py:179-207): async sharded save of
{params, opt_state, step} plus client state, resumable mid-run.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from imagdressing_tpu.train.step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, extra: Optional[dict] = None) -> None:
        step = int(jax.device_get(state.step))
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"extra": ocp.args.JsonSave(extra)} if extra is not None else {}
            ),
        )
        self._mgr.save(step, args=args)

    def restore(
        self, state_template: TrainState
    ) -> Tuple[Optional[TrainState], Optional[dict]]:
        """Restore the latest checkpoint onto the template's shardings.
        Returns (state, extra) or (None, None) when nothing exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        # the checkpoint may or may not carry the 'extra' JSON item (save()
        # only writes it when given one) — request it when present
        items = {"state": ocp.args.StandardRestore(state_template)}
        try:
            present = self._mgr.item_metadata(step)
            has_extra = present is not None and "extra" in present
        except Exception:
            has_extra = False
        if has_extra:
            items["extra"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**items))
        return restored["state"], restored.get("extra")

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
