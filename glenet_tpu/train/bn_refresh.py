"""Post-training BatchNorm statistic re-estimation (SWA `update_bn` style).

pcdet inherits torch BN defaults (momentum 0.01, reference
pcdet/models/model_utils/basic_block_2d.py + backbone norm_fn partials) and
trains for tens of thousands of steps, so the EMA running stats converge to
the true activation moments.  Short runs (overfit harnesses, fine-tunes)
leave the EMA several time constants short; for deep BN stacks
(PointNet2MSG has 26 BN layers) the train/eval skew can collapse eval
accuracy entirely while train-mode metrics look converged.

This module recomputes the running stats *exactly*: for each batch we run
one train-mode forward (which EMA-updates the stats once), algebraically
invert the EMA update to recover that batch's raw moments, then combine
batches with the law of total variance:

    mean  = E_b[mean_b]
    var   = E_b[var_b] + E_b[mean_b^2] - mean^2

This equals the moments over the pooled dataset when batches are equal
size (torch.optim.swa_utils.update_bn computes the same quantity by
resetting momentum to a running 1/i average).
"""
from __future__ import annotations

import jax
import numpy as np


def _set_by_path(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def refresh_batch_stats(variables, batches, stats_fn, momentum):
    """Re-estimate every `batch_stats` {mean, var} pair over `batches`.

    variables: full variable dict (must contain 'batch_stats').
    batches:   iterable of model batches (equal batch size assumed).
    stats_fn:  (variables, batch) -> new batch_stats tree after ONE
               train-mode forward starting from `variables`.
    momentum:  the EMA momentum the model's BN layers use
               (torch convention: new = (1 - m) * old + m * batch).

    Returns `variables` with 'batch_stats' replaced by exact dataset
    moments.
    """
    from flax.core import unfreeze

    old = variables.get('batch_stats')
    if not old:
        return variables
    old = unfreeze(old)
    flat_old = jax.tree_util.tree_flatten_with_path(old)[0]
    paths = [tuple(getattr(k, 'key', getattr(k, 'idx', None)) for k in p)
             for p, _ in flat_old]
    old_leaves = [np.asarray(v, np.float64) for _, v in flat_old]

    # one train-mode forward per batch; invert the EMA update to recover
    # that batch's raw moments (per-channel vectors — cheap to keep)
    per_batch = []
    for batch in batches:
        new = unfreeze(stats_fn(variables, batch))
        new_leaves = [np.asarray(v, np.float64)
                      for _, v in jax.tree_util.tree_flatten_with_path(new)[0]]
        per_batch.append([
            (nl - (1.0 - momentum) * o) / momentum
            for o, nl in zip(old_leaves, new_leaves)])
    if not per_batch:
        return variables

    avg = [np.mean([pb[i] for pb in per_batch], axis=0)
           for i in range(len(paths))]
    by_path = dict(zip(paths, range(len(paths))))

    refreshed = old
    for i, path in enumerate(paths):
        if path[-1] == 'mean':
            _set_by_path(refreshed, path, avg[i].astype(np.float32))
        else:
            mi = by_path[path[:-1] + ('mean',)]
            pooled_mean = avg[mi]
            mean_sq = np.mean([pb[mi] ** 2 for pb in per_batch], axis=0)
            pooled_var = avg[i] + mean_sq - pooled_mean * pooled_mean
            _set_by_path(refreshed, path,
                         np.clip(pooled_var, 0.0, None).astype(np.float32))
    out = dict(variables)
    out['batch_stats'] = refreshed
    return out


def refresh_detector_stats(det, variables, batches, rng=None):
    """Convenience wrapper: re-estimate a Detector's BN stats using its
    train-mode loss forward (gt fields must be present in the batches)."""
    from ..models.layers import BN_MOMENTUM

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    step = jax.jit(
        lambda v, b, k: det.loss_fn(v, b, rng=k)[1][1]['batch_stats'])

    calls = [0]

    def stats_fn(v, batch):
        calls[0] += 1
        return step(v, batch, jax.random.fold_in(rng, calls[0]))

    return refresh_batch_stats(variables, batches, stats_fn, BN_MOMENTUM)
