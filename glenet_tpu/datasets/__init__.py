"""Dataset registry — name-driven construction like the reference
pcdet/datasets/__init__.py:47-76 build_dataloader, so any config's
DATA_CONFIG.DATASET selects its adapter (the round-1 CLIs hardcoded
KittiDataset, making Waymo configs untrainable).

Multi-host note: there is no DistributedSampler here — each JAX process
builds its own dataset and `iter_batches(..., process_rank, process_count)`
shards the index space per host (the TPU-native per-host input pipeline,
SURVEY.md §2.5).
"""
from __future__ import annotations


def build_dataset(data_cfg, class_names, training=True, root_path=None,
                  logger=None, seed=None):
    name = data_cfg.get('DATASET', 'KittiDataset')
    if name == 'KittiDataset':
        from .kitti_dataset import KittiDataset
        cls = KittiDataset
    elif name == 'WaymoDataset':
        from .waymo_dataset import WaymoDataset
        cls = WaymoDataset
    elif name == 'NuScenesDataset':
        from .nuscenes_dataset import NuScenesDataset
        cls = NuScenesDataset
    elif name == 'LyftDataset':
        from .lyft_dataset import LyftDataset
        cls = LyftDataset
    elif name == 'PandasetDataset':
        from .pandaset_dataset import PandasetDataset
        cls = PandasetDataset
    else:
        raise NotImplementedError(f'unknown DATASET {name!r}')
    return cls(data_cfg, class_names, training=training,
               root_path=root_path, logger=logger, seed=seed)


__all__ = ['build_dataset']
