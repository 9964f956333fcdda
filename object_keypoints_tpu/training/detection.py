"""Iteration-based detection trainer (the vendored training loop).

Rebuild of corner_net_lite/train.py:89-183 + nnet/py_factory.py:33-137
semantics, TPU-style: instead of prefetch *processes* + a pinned-memory
thread + DataParallel chunks, a threaded host pipeline feeds one jitted
train step whose batch is sharded over the mesh's data axis. Parity pieces:

- iteration-based loop with ``max_iter`` / ``val_iter`` / ``display`` /
  ``snapshot`` cadences (train.py:162-183),
- step LR schedule: divide by ``decay_rate`` every ``stepsize`` iterations,
  recomputed from the step counter on resume (train.py:150-154),
- snapshot files ``<name>_<iter>`` (py_factory.py:119-137) via Orbax,
- adam or sgd (py_factory.py:61-72).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from object_keypoints_tpu.training.losses import cornernet_loss, cornernet_saccade_loss
from object_keypoints_tpu.data.detection_targets import gather_tags
from object_keypoints_tpu.training.trainer import TrainState


def step_decay_schedule(base_lr: float, stepsize: int, decay_rate: float):
    """lr / decay_rate every stepsize iters (train.py:150-154)."""

    def schedule(count):
        return base_lr / (decay_rate ** (count // stepsize))

    return schedule


def make_detection_optimizer(system_config) -> optax.GradientTransformation:
    schedule = step_decay_schedule(
        system_config.learning_rate, system_config.stepsize, system_config.decay_rate
    )
    if system_config.opt_algo == "adam":
        return optax.adam(schedule)
    elif system_config.opt_algo == "sgd":
        return optax.sgd(schedule, momentum=0.9)
    raise ValueError(f"unknown opt_algo {system_config.opt_algo}")


@functools.partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def detection_train_step(model, state: TrainState, batch):
    """One CornerNet training step. batch: dict(images (N,H,W,3) NHWC,
    tl_heatmaps/br_heatmaps (N,oh,ow,C), tl_regrs/br_regrs (N,M,2),
    tl_tags/br_tags (N,M), tag_mask (N,M))."""

    def loss_fn(params):
        outs, new_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], True, mutable=["batch_stats"],
        )
        tl_heats, br_heats, tl_tags_f, br_tags_f, tl_offs_f, br_offs_f = outs[:6]
        tl_tags = [gather_tags(t, batch["tl_tags"])[..., 0] for t in tl_tags_f]
        br_tags = [gather_tags(t, batch["br_tags"])[..., 0] for t in br_tags_f]
        tl_offs = [gather_tags(t, batch["tl_tags"]) for t in tl_offs_f]
        br_offs = [gather_tags(t, batch["br_tags"]) for t in br_offs_f]
        loss = cornernet_loss(
            (tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs),
            (batch["tl_heatmaps"], batch["br_heatmaps"], batch["tag_mask"],
             batch["tl_regrs"], batch["br_regrs"]),
        )
        return loss, new_state["batch_stats"]

    (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_batch_stats, opt_state=new_opt_state,
        ),
        {"loss": loss},
    )


@functools.partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def saccade_train_step(model, state: TrainState, batch):
    """One CornerNet-Saccade training step: the CornerNet terms with
    validity-masked focal plus the per-scale attention focal
    (losses.py:97-165 semantics; targets from
    data.detection_targets.saccade_sample).

    batch adds to the cornernet layout: tl_valids/br_valids (N, oh, ow, C)
    and attentions — a tuple of per-scale (N, ah, aw, 1) masks, coarse to
    fine, matching the model's collected upsample features."""

    def loss_fn(params):
        outs, new_state = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], True, mutable=["batch_stats"],
        )
        tl_heats, br_heats, tl_tags_f, br_tags_f, tl_offs_f, br_offs_f, atts = outs[:7]
        tl_tags = [gather_tags(t, batch["tl_tags"])[..., 0] for t in tl_tags_f]
        br_tags = [gather_tags(t, batch["br_tags"])[..., 0] for t in br_tags_f]
        tl_offs = [gather_tags(t, batch["tl_tags"]) for t in tl_offs_f]
        br_offs = [gather_tags(t, batch["br_tags"]) for t in br_offs_f]
        loss = cornernet_saccade_loss(
            (tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs, atts),
            (batch["tl_heatmaps"], batch["br_heatmaps"], batch["tag_mask"],
             batch["tl_regrs"], batch["br_regrs"],
             batch["tl_valids"], batch["br_valids"],
             list(batch["attentions"])),
        )
        return loss, new_state["batch_stats"]

    (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_batch_stats, opt_state=new_opt_state,
        ),
        {"loss": loss},
    )


def train_detector(
    model,
    variables,
    system_config,
    batches: Iterator,
    start_iter: int = 0,
    snapshot_dir: Optional[str] = None,
    on_display: Optional[Callable] = None,
    train_step_fn: Optional[Callable] = None,
):
    """The vendored iteration loop (train.py:162-183). ``batches`` yields
    detection batches; returns the final TrainState. ``train_step_fn``
    selects the per-family step (the reference's data_sampling_func
    dispatcher, sample/__init__.py:1-5): detection_train_step (default) or
    saccade_train_step."""
    import orbax.checkpoint as ocp

    tx = make_detection_optimizer(system_config)
    state = TrainState(
        step=jnp.asarray(start_iter, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    # resume: replay the step counter so the schedule picks up the decayed
    # LR (train.py:150-154); optax schedules read state.step via opt_state
    if start_iter:
        state = state.replace(
            opt_state=optax.tree_utils.tree_set(
                state.opt_state, count=jnp.asarray(start_iter, jnp.int32)
            )
        )

    step_fn = train_step_fn or detection_train_step
    ckpt = ocp.PyTreeCheckpointer() if snapshot_dir else None
    losses = []
    for iteration in range(start_iter + 1, int(system_config.max_iter) + 1):
        batch = next(batches)
        state, metrics = step_fn(model, state, batch)
        losses.append(float(metrics["loss"]))
        if iteration % system_config.display == 0:
            msg = f"iter {iteration}: loss {np.mean(losses[-system_config.display:]):.5f}"
            (on_display or print)(msg)
        if snapshot_dir and iteration % system_config.snapshot == 0:
            name = (system_config.snapshot_name or "model") + f"_{iteration}"
            ckpt.save(
                os.path.join(os.path.abspath(snapshot_dir), name),
                jax.tree.map(np.asarray, {
                    "params": state.params, "batch_stats": state.batch_stats,
                    "step": iteration,
                }),
                force=True,
            )
    return state
