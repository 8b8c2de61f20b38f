"""Score a results file with the Matterport3D R2R protocol
(reference ``scripts/calculate-metrics.py``).

    python scripts/calculate_metrics.py <results.json> [--data_dir data]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.evaluation.metrics import Evaluation


def main(argv=None):
    parser = argparse.ArgumentParser("Calculate standard VLN metrics")
    parser.add_argument("path", type=str, help="path to a results file")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--split", type=str, default="")
    args = parser.parse_args(argv)

    split = args.split or ("val_unseen" if "val_unseen" in args.path
                           else "val_seen")
    ev = Evaluation([split], data_dir=args.data_dir)
    summary, _ = ev.score_file(args.path)
    summary = {k: round(v, 4) for k, v in summary.items()}
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
