"""Optimizers and LR schedules (optax).

`adam_onecycle` reproduces the reference's fastai-style OneCycle
(tools/train_utils/optimization/learning_schedules_fastai.py:54-78):
  - lr: cosine anneal lr_max/div_factor -> lr_max over pct_start of training,
    then cosine anneal lr_max -> (lr_max/div_factor)/1e4;
  - Adam b1 ("momentum"): moms[0] -> moms[1], then back;
  - decoupled ("true") weight decay as in fastai OptimWrapper
    (fastai_optim.py), applied to all parameters;
  - global grad-norm clip (tools/train_utils/train_utils.py:64-76).
Plus plain `adam` and `sgd` fallbacks (optimization/__init__.py:11-36).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import optax


def annealing_cos(start: float, end: float, pct):
    cos_out = jnp.cos(math.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_lr_schedule(lr_max: float, total_steps: int, div_factor: float,
                         pct_start: float):
    low_lr = lr_max / div_factor
    split = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / max(split, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - split) / max(total_steps - split, 1), 0.0, 1.0)
        lr1 = annealing_cos(low_lr, lr_max, pct1)
        lr2 = annealing_cos(lr_max, low_lr / 1e4, pct2)
        return jnp.where(step < split, lr1, lr2)

    return schedule


def onecycle_mom_schedule(moms, total_steps: int, pct_start: float):
    split = int(total_steps * pct_start)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / max(split, 1), 0.0, 1.0)
        pct2 = jnp.clip((step - split) / max(total_steps - split, 1), 0.0, 1.0)
        m1 = annealing_cos(moms[0], moms[1], pct1)
        m2 = annealing_cos(moms[1], moms[0], pct2)
        return jnp.where(step < split, m1, m2)

    return schedule


def build_optimizer(opt_cfg, total_steps: int):
    """Build from reference OPTIMIZATION config. Returns (tx, lr_schedule)."""
    name = opt_cfg.OPTIMIZER
    lr = float(opt_cfg.LR)
    wd = float(opt_cfg.get('WEIGHT_DECAY', 0.0))
    clip = float(opt_cfg.get('GRAD_NORM_CLIP', 0.0))

    if name == 'adam_onecycle':
        lr_sched = onecycle_lr_schedule(
            lr, total_steps, float(opt_cfg.DIV_FACTOR), float(opt_cfg.PCT_START))
        mom_sched = onecycle_mom_schedule(
            tuple(opt_cfg.MOMS), total_steps, float(opt_cfg.PCT_START))

        def scaled_adam():
            # adam with step-scheduled b1 via inject_hyperparams
            return optax.inject_hyperparams(
                lambda learning_rate, b1: optax.chain(
                    optax.scale_by_adam(b1=b1, b2=0.99),
                    optax.add_decayed_weights(wd),
                    optax.scale_by_learning_rate(learning_rate),
                ))(learning_rate=lr_sched, b1=mom_sched)

        tx = scaled_adam()
    elif name == 'adam':
        lr_sched = optax.constant_schedule(lr)
        tx = optax.adamw(lr_sched, weight_decay=wd)
    elif name == 'sgd':
        lr_sched = optax.constant_schedule(lr)
        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(lr_sched, momentum=float(opt_cfg.get('MOMENTUM', 0.9))))
    else:
        raise NotImplementedError(name)

    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, lr_sched
