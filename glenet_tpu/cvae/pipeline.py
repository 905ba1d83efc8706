"""CVAE training / prediction / uncertainty-mapping pipeline.

Replaces the reference's cvae_uncertainty train.py + test.py + predict.sh +
mapping_uncertainty.py + change_gt_infos.py flow (SURVEY.md §3.4/§3.5):
  1. K-fold training of the CVAE on per-object crops with KL annealing
     (linear 0 -> 1 over epochs) — loss = reg + anneal * latent + regular;
  2. N stochastic prediction passes per fold (z ~ prior);
  3. per-object variance of the 7 normalized box dims across passes, with
     heading aligned to the gt (limit_period then sin) — mapping_uncertainty
     .py:95-146;
  4. injection of `uncertainty` into kitti_infos / dbinfos (-1 vector for
     non-Car objects) — change_gt_infos.py:17-55.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..train import optim as optim_lib
from ..utils.common import limit_period_np
from .model import CVAEGenerator, cvae_loss


def build_generator(model_cfg):
    return CVAEGenerator(
        latent_dim=int(model_cfg.LATENT_DIM),
        num_bins=int(model_cfg.get('NUM_DIR_BINS', 2)))


def make_cvae_train_step(gen, model_cfg, tx):
    lw = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    dir_offset = float(model_cfg.get('DIR_OFFSET', 0.78539))
    num_bins = int(model_cfg.get('NUM_DIR_BINS', 2))

    def train_step(params, batch_stats, opt_state, batch, rng, anneal):
        def loss_fn(p):
            out, new_state = gen.apply(
                {'params': p, 'batch_stats': batch_stats},
                batch['points'], batch['gt_boxes_input'], rng,
                train=True, mutable=['batch_stats'])
            reg, latent, regular, parts = cvae_loss(
                out, batch['gt_boxes'], p, lw,
                num_bins=num_bins, dir_offset=dir_offset)
            total = reg + anneal * latent + regular
            metrics = {'loss': total, 'reg_loss': reg, 'latent_loss': latent,
                       'regular_loss': regular, **parts}
            return total, (metrics, new_state)

        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, new_state['batch_stats'], opt_state, metrics

    return jax.jit(train_step)


def train_cvae(cfg, dataset, seed=0, log_every=50, logger=None,
               num_epochs=None):
    """Full training loop. Returns (gen, variables)."""
    gen = build_generator(cfg.MODEL)
    opt_cfg = cfg.OPTIMIZATION
    batch_size = int(opt_cfg.BATCH_SIZE_PER_GPU)
    num_epochs = num_epochs or int(opt_cfg.NUM_EPOCHS)
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    total_steps = steps_per_epoch * num_epochs
    tx, lr_sched = optim_lib.build_optimizer(opt_cfg, total_steps)

    rng = jax.random.PRNGKey(seed)
    example = next(dataset.iter_batches(batch_size, seed=seed))
    rng, init_rng, z_rng = jax.random.split(rng, 3)
    variables = jax.jit(lambda r, p, y, z: gen.init(r, p, y, z, train=True))(
        init_rng, jnp.asarray(example['points']),
        jnp.asarray(example['gt_boxes_input']), z_rng)
    params = variables['params']
    batch_stats = variables['batch_stats']
    opt_state = tx.init(params)
    step_fn = make_cvae_train_step(gen, cfg.MODEL, tx)

    it = 0
    for epoch in range(num_epochs):
        anneal = min((epoch + 1) / num_epochs, 1.0)
        dataset.linear_anneal = anneal
        for batch in dataset.iter_batches(batch_size, seed=seed * 10000 + epoch):
            rng, step_rng = jax.random.split(rng)
            params, batch_stats, opt_state, metrics = step_fn(
                params, batch_stats, opt_state,
                {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ('points', 'gt_boxes', 'gt_boxes_input')},
                step_rng, anneal)
            if logger and it % log_every == 0:
                logger.info(
                    f'epoch {epoch} it {it} loss {float(metrics["loss"]):.4f} '
                    f'reg {float(metrics["reg_loss"]):.4f} '
                    f'latent {float(metrics["latent_loss"]):.4f}')
            it += 1
    return gen, {'params': params, 'batch_stats': batch_stats}


def predict_samples(gen, variables, dataset, model_cfg, n_passes=30,
                    batch_size=64, seed=0):
    """N stochastic passes over the (val-fold) dataset.

    Returns list of n_passes dicts: key "{frame_id}_{gt_id}" ->
    {'pred_box': (7,), 'gt_box': (7,)} in normalized coordinates.
    """
    dir_offset = float(model_cfg.get('DIR_OFFSET', 0.78539))
    dir_limit = float(model_cfg.get('DIR_LIMIT_OFFSET', 0.0))
    sample_fn = jax.jit(lambda v, p, r: gen.apply(
        v, p, r, dir_offset, dir_limit, method=CVAEGenerator.sample))

    results = []
    for pass_idx in range(n_passes):
        rng = jax.random.PRNGKey(seed * 1000 + pass_idx)
        out = {}
        for batch in dataset.iter_batches(batch_size, shuffle=False,
                                          drop_last=False):
            rng, r = jax.random.split(rng)
            pred = np.asarray(sample_fn(
                variables, jnp.asarray(batch['points']), r))
            for i in range(len(batch['frame_id'])):
                key = f"{batch['frame_id'][i]}_{batch['gt_id'][i]}"
                out[key] = {'pred_box': pred[i, :7],
                            'gt_box': batch['gt_boxes'][i]}
        results.append(out)
    return results


def mapping_uncertainty(per_pass_results):
    """Across-pass variance per object (mapping_uncertainty.py:95-146).

    Args: list of dicts (one per stochastic pass).
    Returns: dict key -> (7,) variance in normalized box space.
    """
    out = {}
    keys = per_pass_results[0].keys()
    for key in keys:
        preds = np.stack([r[key]['pred_box'] for r in per_pass_results
                          if key in r])
        gt_angle = per_pass_results[0][key]['gt_box'][6]
        h = limit_period_np(preds[:, 6] - gt_angle, 0, 2 * np.pi)
        preds = preds.copy()
        preds[:, 6] = np.sin(h)
        out[key] = np.var(preds[:, :7], axis=0)
    return out


def change_gt_infos(uncertainty_map, kitti_infos, db_infos,
                    car_class='Car'):
    """Inject uncertainty into infos/dbinfos (change_gt_infos.py:17-55).

    Mutates and returns (kitti_infos, db_infos): every annotation gets
    annos['uncertainty'] ((-1,)*7 for non-Car), every Car db entry gets
    info['uncertainty'].
    """
    for info in kitti_infos:
        frame_id = info['image']['image_idx']
        names = info['annos']['name']
        index_list = info['annos']['index']
        unc = []
        for i, idx in enumerate(index_list):
            if names[i] != car_class:
                unc.append(np.full(7, -1.0))
            else:
                unc.append(np.asarray(uncertainty_map[f'{frame_id}_{idx}']))
        info['annos']['uncertainty'] = np.array(unc)

    for info in db_infos.get(car_class, []):
        key = f"{info['image_idx']}_{info['gt_idx']}"
        info['uncertainty'] = np.asarray(uncertainty_map[key])
    return kitti_infos, db_infos


def change_gt_infos_waymo(uncertainty_map, waymo_infos, db_infos,
                          vehicle_class='Vehicle'):
    """Waymo uncertainty injection (change_gt_infos_waymo.py:17-62):
    per-frame key is '{sequence}#{sample_idx}', non-Vehicle annos get -1;
    every Vehicle db entry gets info['uncertainty']."""
    for info in waymo_infos:
        frame_id = (info['point_cloud']['lidar_sequence'] + '#'
                    + str(info['point_cloud']['sample_idx']))
        names = info['annos']['name']
        unc = []
        for idx in range(len(names)):
            if names[idx] != vehicle_class:
                unc.append(np.full(7, -1.0))
            else:
                unc.append(np.asarray(uncertainty_map[f'{frame_id}_{idx}']))
        info['annos']['uncertainty'] = (np.array(unc) if unc
                                        else np.zeros((0, 7)))

    for info in db_infos.get(vehicle_class, []):
        frame_id = info['sequence_name'] + '#' + str(info['sample_idx'])
        info['uncertainty'] = np.asarray(
            uncertainty_map[f"{frame_id}_{info['gt_idx']}"])
    return waymo_infos, db_infos


def run_kfold_pipeline(cfg, root_path, n_folds=10, n_passes=30, seed=0,
                       logger=None, num_epochs=None, infos=None,
                       output_dir=None):
    """Steps 1.1-1.3 of the label-uncertainty generation (SURVEY.md §3.5).
    DATA_CONFIG.DATASET selects the KITTI (10-fold) or Waymo (5-fold)
    crop dataset."""
    from .dataset import KittiGtDataset, WaymoGtDataset
    ds_cls = (WaymoGtDataset
              if cfg.DATA_CONFIG.get('DATASET') == 'WaymoGtDataset'
              else KittiGtDataset)
    uncertainty_map = {}
    for fold in range(n_folds):
        fold_cfg = dict(cfg.DATA_CONFIG)
        fold_cfg['FOLD_IDX'] = fold
        fold_cfg['NUM_FOLDS'] = n_folds
        from ..config import Cfg
        fold_cfg = Cfg(fold_cfg)
        train_ds = ds_cls(fold_cfg, training=True,
                          root_path=root_path, logger=logger,
                          infos=infos)
        val_ds = ds_cls(fold_cfg, training=False,
                        root_path=root_path, logger=logger,
                        infos=infos)
        if logger:
            logger.info(f'fold {fold}: train {len(train_ds)} val {len(val_ds)}')
        gen, variables = train_cvae(cfg, train_ds, seed=seed + fold,
                                    logger=logger, num_epochs=num_epochs)
        per_pass = predict_samples(
            gen, variables, val_ds, cfg.MODEL, n_passes=n_passes,
            batch_size=int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU), seed=seed)
        uncertainty_map.update(mapping_uncertainty(per_pass))
    if output_dir is not None:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / 'un_v4.pkl', 'wb') as f:
            pickle.dump(uncertainty_map, f)
    return uncertainty_map
