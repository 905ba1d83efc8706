"""Train state + pure train/eval steps.

TPU-native trainer core (replaces tools/train_utils/train_utils.py:11-157):
one pjit'd step = forward + loss + grad + clip + optimizer update + BN-stat
update.  Data parallelism comes from sharding the batch over the mesh
(see glenet_tpu.parallel.mesh); XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(detector, rng, example_batch, tx) -> TrainState:
    variables = detector.init(rng, example_batch)
    params = variables['params']
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=tx.init(params),
    )


def make_train_step(detector, tx):
    """Returns a pure (state, batch) -> (state, metrics) function."""

    def train_step(state: TrainState, batch):
        step_rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            loss, (metrics, new_model_state) = detector.loss_fn(
                variables, batch, train=True, rng=step_rng)
            return loss, (metrics, new_model_state)

        grads, (metrics, new_model_state) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics['grad_norm'] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get('batch_stats', state.batch_stats),
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(detector, post_cfg=None):
    def eval_step(state: TrainState, batch):
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        return detector.predict(variables, batch, post_cfg=post_cfg)
    return eval_step
