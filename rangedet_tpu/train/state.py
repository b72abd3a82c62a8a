"""TrainState — replaces the reference's 1170-line DetModule executor
(utils/detection_module.py): in JAX the "module" collapses to a pytree of
(params, batch_stats, opt_state) and a jitted step function.
"""
from __future__ import annotations

from typing import Any

import flax
import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, cfg, tx, rng, sample_batch) -> TrainState:
    # jit the init: eager init dispatches thousands of tiny ops (very slow on
    # remote/tunneled backends); one compiled program is strictly better
    init_fn = jax.jit(model.init, static_argnums=(3,))
    variables = init_fn(
        rng, sample_batch["input_data"], sample_batch["coord"], True
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
    )


def param_count(state: TrainState) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(state.params))
