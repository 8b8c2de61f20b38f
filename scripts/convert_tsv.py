"""Convert reference BUTD TSV shards into a VLN store (pipeline step 4).

    python scripts/convert_tsv.py out.vlnstore shard0.tsv shard1.tsv ...
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.pipeline.detector import convert_tsv_to_store


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_path")
    p.add_argument("tsv", nargs="+")
    p.add_argument("--pano", action="store_true", default=False)
    a = p.parse_args(argv)
    n = convert_tsv_to_store(a.tsv, a.out_path, pano=a.pano)
    print(f"converted {n} records -> {a.out_path}")


if __name__ == "__main__":
    main()
