"""Freeze eval negatives into a testset JSON (pipeline step 9; reference
scripts/build_dataset/build_testset.py).

    python scripts/build_testset.py --pre_dataset ytb --prefix merge+ ...
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.pipeline.build_dataset import freeze_testset
from youtube_vln_tpu.training.engine import (load_pretrain_datasets,
                                             resolve_tokenizer,
                                             testset_paths)
from youtube_vln_tpu.utils.cli import get_parser, args_to_run_config


def main(argv=None):
    parser = get_parser()
    parser.add_argument("--out", default="", type=str)
    ns = parser.parse_args(argv)
    ns.ranking = True
    args = args_to_run_config(ns)
    tokenizer = resolve_tokenizer(args)
    train_ds, _, reader = load_pretrain_datasets(args, tokenizer)
    out = ns.out or testset_paths(args)["ranking"]
    path = freeze_testset(train_ds, out)
    reader.close()
    print(f"testset -> {path}")


if __name__ == "__main__":
    main()
