"""The training loop: one fused jitted step per epoch + host-side orchestration.

TPU-native equivalent of the reference's epoch loop (Main_cl.cpp:161-195)
and execute_batch/update_parameters machinery
(ConfigBasedDataPipeline.cpp:128-195, 325-361):

* the reference chains 9 kernels per mini-batch (3 forward, 1 last-delta,
  2 deltas, 3 backprop) plus a per-layer update kernel, with cl_event
  dependencies and grad accumulation across mini-batches; here the WHOLE
  epoch — forward + backward over the full train set + the SGD update —
  is ONE jitted XLA program with donated parameter buffers, so weights
  never leave HBM and XLA fuses/schedules the chain;
* gradients are raw sums over the train set (see models.srcnn.loss_sum)
  and the update divides by the train-set size, exactly as the reference;
* per-epoch reshuffled 20% validation split (divide_samples), validation
  MSE every 25 epochs and on the last epoch, NaN abort with error status
  (Main_cl.cpp:174-192);
* optional gradient chunking (``mini_batch_count``) re-creates the
  reference's mini-batch memory bound via ``lax.map`` over static chunks
  — numerically the same raw-sum gradient.

Multi-chip: pass a ``jax.sharding.Mesh`` — the batch dimension is sharded
over the ``"data"`` axis and XLA inserts the gradient ``psum`` (the
TPU-native replacement for the reference's atomic gradient accumulation,
SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import loss_sum, luma_mse_metrics
from ..optim import init_optimizer_state, update_parameters
from ..utils.config import Config
from .samples import SampleSet, divide_samples


@dataclass
class TrainState:
    """Parameters + momentum buffers + the persistent epoch counter
    (the reference's ``epochs`` field, serialized in the params file)."""

    params: list
    prev_delta: list
    epochs: int = 0


def _grads(params, inputs, gts, num_chunks: int):
    """Raw-sum gradients over the batch, optionally accumulated in
    ``num_chunks`` sequential chunks to bound activation memory (the
    reference's mini-batch split, Main_cl.cpp:92-93,128)."""
    if num_chunks <= 1:
        return jax.grad(loss_sum)(params, inputs, gts)
    s = inputs.shape[0]
    chunk = s // num_chunks  # caller guarantees divisibility
    xs = inputs.reshape(num_chunks, chunk, *inputs.shape[1:])
    ts = gts.reshape(num_chunks, chunk, *gts.shape[1:])

    def body(carry, xt):
        x, t = xt
        g = jax.grad(loss_sum)(params, x, t)
        return jax.tree.map(lambda a, b: a + b, carry, g), None

    zero = jax.tree.map(jnp.zeros_like, params)
    acc, _ = jax.lax.scan(body, zero, (xs, ts))
    return acc


def make_train_step(
    cfg: Config,
    mesh=None,
    num_chunks: int = 1,
) -> Callable:
    """Build the jitted epoch step:
    ``(params, prev_delta, inputs, gts) -> (params', prev_delta')``.

    ``inputs``/``gts``: (T, H, W, C). The update divides by T (the
    reference passes train_set.size() as batch_size — Main_cl.cpp:167-170).
    """
    lrs = tuple(cfg.learning_rates)
    momentum, wd = cfg.momentum, cfg.weight_decay

    def step(params, prev_delta, inputs, gts):
        grads = _grads(params, inputs, gts, num_chunks)
        return update_parameters(
            params, prev_delta, grads, lrs, momentum, wd, inputs.shape[0]
        )

    donate = jax.jit(step, donate_argnums=(0, 1))
    if mesh is None:
        return donate

    from ..parallel.data_parallel import shard_batch, replicate

    def sharded_step(params, prev_delta, inputs, gts):
        inputs = shard_batch(mesh, inputs)
        gts = shard_batch(mesh, gts)
        params = replicate(mesh, params)
        prev_delta = replicate(mesh, prev_delta)
        return donate(params, prev_delta, inputs, gts)

    return sharded_step


def make_validation_fn(mesh=None) -> Callable:
    """Jitted validation: total squared error over the set
    (execute_batch(false, ...), ConfigBasedDataPipeline.cpp:178-187)."""
    fn = jax.jit(luma_mse_metrics)
    if mesh is None:
        return fn

    from ..parallel.data_parallel import shard_batch

    def sharded(params, inputs, gts):
        return fn(params, shard_batch(mesh, inputs), shard_batch(mesh, gts))

    return sharded


def train_loop(
    cfg: Config,
    samples: SampleSet,
    state: TrainState,
    epochs: int,
    *,
    validation_percent: int = 20,   # hardcoded in the reference (Main_cl.cpp:92)
    mini_batch_count: int = 1,      # memory chunking; 2 in the reference (Main_cl.cpp:93)
    validation_cadence: int = 25,   # Main_cl.cpp:174
    mesh=None,
    seed: Optional[int] = None,
    log: Callable[[str], None] = print,
    on_epoch: Optional[Callable[[int, Optional[float]], None]] = None,
) -> bool:
    """Run ``epochs`` epochs, mutating ``state``. Returns True on error
    (NaN validation loss — Main_cl.cpp:179-184)."""
    rng = np.random.default_rng(seed)
    s = samples.count
    validation_size = int(s * validation_percent / 100.0)
    train_size = s - validation_size
    if validation_size == 0:
        log("[WARNING] Validation set is empty")
    else:
        log(
            f"validation_set_size: {validation_size}/{s} = "
            f"{validation_size * 100.0 / s}%"
        )

    num_chunks = 1
    if mini_batch_count > 1:
        # pick the largest chunk count <= mini_batch_count dividing train_size
        for c in range(min(mini_batch_count, train_size), 0, -1):
            if train_size % c == 0:
                num_chunks = c
                break

    step = make_train_step(cfg, mesh=mesh, num_chunks=num_chunks)
    validate = make_validation_fn(mesh=mesh)

    inputs = jnp.asarray(samples.input_luma)
    gts = jnp.asarray(samples.expected_luma)

    params = jax.tree.map(jnp.asarray, state.params)
    prev = jax.tree.map(jnp.asarray, state.prev_delta)

    error = False
    for epoch_id in range(epochs):
        train_idx, val_idx = divide_samples(s, validation_size, rng)
        params, prev = step(params, prev, inputs[train_idx], gts[train_idx])
        state.epochs += 1  # ++epochs per update (ConfigBasedDataPipeline.cpp:360)

        val_err = None
        if (epoch_id % validation_cadence) == 0 or epoch_id == epochs - 1:
            if validation_size > 0:
                val_err = float(validate(params, inputs[val_idx], gts[val_idx]))
                # the reference aborts on NaN only (Main_cl.cpp:179-184); we
                # also abort on inf — a diverged run is equally unrecoverable
                # and the reference would loop printing 'inf' forever
                if not math.isfinite(val_err):
                    log(
                        f"Error: squared error is NAN/Inf, after {epoch_id}/{epochs} epochs"
                    )
                    error = True
                    break
                mean_err = val_err / validation_size
                log(
                    f"[{epoch_id}] mean validation error: {mean_err} "
                    f"({mean_err / samples.pixels_per_sample} per px)"
                )
        if on_epoch is not None:
            on_epoch(epoch_id, val_err)

    state.params = [
        {"w": np.asarray(l["w"]), "b": np.asarray(l["b"])} for l in params
    ]
    state.prev_delta = [
        {"w": np.asarray(l["w"]), "b": np.asarray(l["b"])} for l in prev
    ]
    return error


def init_train_state(cfg: Config, seed: Optional[int] = None) -> TrainState:
    """Fresh state: load ``cfg.parameters_file`` if set, else random init
    (ConfigBasedDataPipeline::init, ConfigBasedDataPipeline.cpp:32-52)."""
    import os

    from ..utils.params_io import load_parameters_file, random_parameters

    specs = cfg.layer_specs()
    epochs = 0
    if cfg.parameters_file and os.path.isfile(cfg.parameters_file):
        params, epochs = load_parameters_file(cfg.parameters_file, specs)
    else:
        if cfg.parameters_file:
            print(
                f"[Warning] parameters file '{cfg.parameters_file}' not found, "
                "using random initialization"
            )
        params = random_parameters(specs, cfg.distributions, seed=seed)
    state = TrainState(params=params, prev_delta=None, epochs=epochs)
    state.prev_delta = [
        {"w": np.zeros_like(l["w"]), "b": np.zeros_like(l["b"])} for l in params
    ]
    return state
