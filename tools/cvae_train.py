"""GLENet CVAE label-uncertainty generation CLI.

Wraps the full reference pipeline (SURVEY.md §3.5): K-fold CVAE training on
KITTI gt-database crops, N stochastic prediction passes per fold, per-object
variance mapping (un_v4.pkl), and injection of `uncertainty` into
kitti_infos_train.pkl / kitti_dbinfos_train.pkl (written as *_wconf.pkl).
Replaces the reference's dist_train.sh x 10 folds + predict.sh x 30 +
mapping_uncertainty.py + change_gt_infos.py.
"""
import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--data_path', type=str, required=True)
    parser.add_argument('--folds', type=int, default=10)
    parser.add_argument('--passes', type=int, default=30)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--output_dir', type=str, default='output/uncertainty_dump')
    parser.add_argument('--inject', action='store_true',
                        help='write *_wconf.pkl infos with uncertainty')
    args = parser.parse_args()

    from glenet_tpu.config import cfg, cfg_from_yaml_file
    from glenet_tpu.cvae import pipeline
    from glenet_tpu.utils.common import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = create_logger()
    data_path = Path(args.data_path)

    unc_map = pipeline.run_kfold_pipeline(
        cfg, data_path, n_folds=args.folds, n_passes=args.passes,
        logger=logger, num_epochs=args.epochs, output_dir=args.output_dir)
    logger.info(f'uncertainty map: {len(unc_map)} objects '
                f'-> {args.output_dir}/un_v4.pkl')

    if args.inject:
        with open(data_path / 'kitti_infos_train.pkl', 'rb') as f:
            infos = pickle.load(f)
        with open(data_path / 'kitti_dbinfos_train.pkl', 'rb') as f:
            db = pickle.load(f)
        infos, db = pipeline.change_gt_infos(unc_map, infos, db)
        with open(data_path / 'kitti_infos_train_wconf.pkl', 'wb') as f:
            pickle.dump(infos, f)
        with open(data_path / 'kitti_dbinfos_train_wconf.pkl', 'wb') as f:
            pickle.dump(db, f)
        logger.info('wrote kitti_infos_train_wconf.pkl / '
                    'kitti_dbinfos_train_wconf.pkl — point INFO_PATH / '
                    'DB_INFO_PATH at these to train with label uncertainty')


if __name__ == '__main__':
    main()
