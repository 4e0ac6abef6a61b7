"""Orbax checkpointing: save/restore {params, batch_stats, opt_state, step}.

Reference behavior (SURVEY.md §5): ``torch.save(state_dict)`` per eval with
best-accuracy tracking and a ``--pretrain`` resume flag. TPU-native: an
Orbax ``CheckpointManager`` with ``max_to_keep`` and best-metric retention;
auto-resume picks the latest step.
"""

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper around orbax for TrainState pytrees."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        best_fn_metric: Optional[str] = None,
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(
                (lambda m: m[best_fn_metric]) if best_fn_metric else None
            ),
            best_mode="max",
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state, metrics: Optional[dict] = None):
        saveable = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(saveable),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure of ``state`` (from create_train_state)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(
                        getattr(x, "shape", ()), getattr(x, "dtype", None)
                    ),
                    template,
                )
            ),
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, step

    def restore_variables(self, step: Optional[int] = None):
        """Restore only ``{"params", "batch_stats"}`` for eval/serving.

        Template-free (raw) restore: unlike :meth:`restore`, this does not
        need a matching ``opt_state`` tree, so checkpoints written with ANY
        optimizer (``--optimizer sgd`` included) restore fine in paths that
        never step the optimizer.

        Returns ``(variables_dict, step)``; ``(None, None)`` when empty.
        """
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        return (
            {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"],
            },
            step,
        )

    def close(self):
        self._mgr.close()
