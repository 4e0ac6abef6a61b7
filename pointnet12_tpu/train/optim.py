"""Optimizer + LR schedule matching the reference's training recipe.

Reference behavior (SURVEY.md §3.1): Adam(lr=1e-3, weight_decay=1e-4) or
SGD(momentum 0.9), with StepLR decay (step_size=20 epochs, gamma 0.5/0.7).
torch's Adam ``weight_decay`` is L2-into-gradient (NOT decoupled AdamW), so
the optax equivalent is ``add_decayed_weights`` chained BEFORE adam.
"""

import jax.numpy as jnp
import optax


def make_optimizer(
    name: str = "adam",
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    steps_per_epoch: int = 1,
    lr_step_epochs: int = 20,
    lr_gamma: float = 0.7,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    def schedule(count):
        """torch StepLR: lr = base * gamma^(epoch // step_size)."""
        epoch = count // max(steps_per_epoch, 1)
        return learning_rate * lr_gamma ** (
            jnp.floor_divide(epoch, lr_step_epochs)
        )

    if name == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(schedule),
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum),
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    # Run the update on ONE flat parameter vector: per-tensor updates over
    # ~150 tiny arrays cost ~8 ms/step in per-op overhead on v5e (measured
    # — more than the whole backward pass); flattened they are ~50 us.
    return optax.flatten(tx)
