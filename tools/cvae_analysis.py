"""CVAE uncertainty analysis CLI (reference cvae_uncertainty/eval.py,
statistic_info.py): loads the per-pass prediction pkls produced by the
CVAE pipeline (tools/cvae_train.py --predict) and prints variance-vs-IoU
calibration statistics as JSON.

Usage: python tools/cvae_analysis.py result_pass1.pkl result_pass2.pkl ...
       (or a single pkl holding the list of passes)
"""
import json
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(paths):
    from glenet_tpu.cvae.analysis import analyze
    per_pass = []
    for p in paths:
        with open(p, 'rb') as f:
            data = pickle.load(f)
        if isinstance(data, list):
            per_pass.extend(data)
        else:
            per_pass.append(data)
    report = analyze(per_pass)
    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
