"""The reference's exact SGD + momentum + weight-decay update, as a pure fn.

Replicates update_parameters.cl:17-32 (launched per layer by
ConfigBasedDataPipeline::update_parameters, ConfigBasedDataPipeline.cpp:325-361)
with all of its intentional quirks:

* ``delta_w = momentum · prev_delta_w + lr · grad_w + weight_decay · w``
  — weight decay sits INSIDE the momentum-tracked delta;
* the applied step is ``delta_w / batch_size`` (the gradients arriving
  here are raw sums over the whole train set), but ``prev_delta_w``
  stores the **un-divided** delta (update_parameters.cl:22-24);
* bias gets NO weight decay: ``delta_b = momentum · prev_delta_b +
  lr · grad_b`` (update_parameters.cl:27-32);
* each layer has its own learning rate (config ``learning_rates[i]``,
  ConfigBasedDataPipeline.cpp:336-348).

State layout mirrors params: a list of ``{"w": ..., "b": ...}`` pytrees
holding the previous deltas (the reference's persistent
previous_delta_{weights,bias} GPU buffers).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def init_optimizer_state(params):
    """Zero previous-delta buffers, one per weight/bias tensor."""
    return [
        {"w": jnp.zeros_like(l["w"]), "b": jnp.zeros_like(l["b"])} for l in params
    ]


def update_parameters(
    params,
    prev_delta,
    grads,
    learning_rates: Sequence[float],
    momentum: float,
    weight_decay: float,
    batch_size,
) -> Tuple[list, list]:
    """One optimizer step. Returns ``(new_params, new_prev_delta)``.

    ``batch_size`` is the train-set size for this epoch (the reference
    calls update_parameters once per epoch with ``train_set.size()``,
    Main_cl.cpp:167-170). May be a traced scalar.
    """
    inv_bs = 1.0 / jnp.asarray(batch_size, dtype=jnp.float32)
    new_params = []
    new_prev = []
    for layer, prev, grad, lr in zip(params, prev_delta, grads, learning_rates):
        delta_w = momentum * prev["w"] + lr * grad["w"] + weight_decay * layer["w"]
        delta_b = momentum * prev["b"] + lr * grad["b"]
        new_params.append(
            {"w": layer["w"] - delta_w * inv_bs, "b": layer["b"] - delta_b * inv_bs}
        )
        new_prev.append({"w": delta_w, "b": delta_b})
    return new_params, new_prev
