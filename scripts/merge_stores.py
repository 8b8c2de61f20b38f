"""Merge VLN store shards into one store file.

    python scripts/merge_stores.py out.vlnstore shard0.vlnstore shard1.vlnstore ...

Duplicate keys resolve last-shard-wins (the multi-shard FeaturesReader's
key-merge order).  Use after a per-shard migration (e.g. 11x
convert_lmdb of the reference layout): the native C path packers only
engage when every key of a path lives in ONE store, so a sharded layout
silently degrades item assembly to the ~3x slower Python path.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from youtube_vln_tpu.data.store import merge_stores


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_path")
    p.add_argument("shards", nargs="+")
    a = p.parse_args(argv)
    n = merge_stores(a.shards, a.out_path)
    print(f"merged {len(a.shards)} shards ({n} records) -> {a.out_path}")


if __name__ == "__main__":
    main()
