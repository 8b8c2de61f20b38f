"""Convert a reference LMDB feature database into a VLN store.

    python scripts/convert_lmdb.py <lmdb_path> <out.vlnstore> [--pano]

(Requires the optional `lmdb` package — run on a machine that has it;
reference databases: utils/dataset/features_reader.py:16-66.)
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.data.store import convert_lmdb


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("lmdb_path")
    p.add_argument("out_path")
    p.add_argument("--pano", action="store_true", default=False)
    a = p.parse_args(argv)
    n = convert_lmdb(a.lmdb_path, a.out_path, pano=a.pano)
    print(f"converted {n} records -> {a.out_path}")


if __name__ == "__main__":
    main()
