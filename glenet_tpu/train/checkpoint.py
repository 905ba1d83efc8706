"""Checkpoint save/load with reference-compatible resume semantics
(tools/train_utils/train_utils.py:160-194, tools/train.py:134-141):
  - one file per checkpoint: {epoch, it, params, batch_stats, opt_state}
  - newest-in-dir auto-resume
  - prune to `max_ckpt_save_num` most recent
Serialization via flax msgpack (host arrays).
"""
from __future__ import annotations

import glob
import os
import re
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def checkpoint_state(train_state, epoch: int, it: int):
    # to_state_dict flattens optax NamedTuple states into plain dicts
    # (msgpack can't serialize tuples)
    host = serialization.to_state_dict({
        'params': jax.tree.map(np.asarray, train_state.params),
        'batch_stats': jax.tree.map(np.asarray, train_state.batch_stats),
        'opt_state': jax.tree.map(np.asarray, train_state.opt_state),
        'step': np.asarray(train_state.step),
    })
    return {'epoch': epoch, 'it': it, 'state': host}


def save_checkpoint(state_dict, ckpt_dir, epoch: int,
                    max_ckpt_save_num: int = 30):
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f'checkpoint_epoch_{epoch}.msgpack'
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(state_dict))
    # prune oldest
    ckpts = sorted(glob.glob(str(ckpt_dir / 'checkpoint_epoch_*.msgpack')),
                   key=os.path.getmtime)
    while len(ckpts) > max_ckpt_save_num:
        os.remove(ckpts.pop(0))
    return str(path)


def find_latest_checkpoint(ckpt_dir):
    ckpts = glob.glob(str(Path(ckpt_dir) / 'checkpoint_epoch_*.msgpack'))
    if not ckpts:
        return None
    def epoch_of(p):
        m = re.search(r'checkpoint_epoch_(\d+)', p)
        return int(m.group(1)) if m else -1
    return max(ckpts, key=epoch_of)


def load_checkpoint(path, template=None):
    with open(path, 'rb') as f:
        data = serialization.msgpack_restore(f.read())
    if template is not None:
        data['state'] = serialization.from_state_dict(template, data['state'])
    return data


def restore_train_state(train_state, ckpt):
    """Apply a loaded checkpoint dict onto a TrainState template."""
    st = ckpt['state']
    restored = serialization.from_state_dict(
        {'params': train_state.params,
         'batch_stats': train_state.batch_stats,
         'opt_state': train_state.opt_state,
         'step': train_state.step}, st)
    return train_state.replace(**restored)
