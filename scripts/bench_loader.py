"""Host data-pipeline throughput at the FLAGSHIP geometry.

Measures per-item assembly (YTbDataset.__getitem__: trajectory + negative
sampling, template instruction synthesis, feature gather/pad via the
native C++ path packer when built, MLM/MVM masking) and the end-to-end
Loader rate (collate + f16 transport) with in-process workers, on a
synthetic fixture store with the real shapes: 101 boxes x 2048 features,
paths up to 8 steps, 7 candidates per item.

This pins the "~N traj/s per worker" sizing claim (CLAUDE.md) to a
reproducible number.  On this 1-core dev box multi-worker scaling cannot
be measured — run with --num_workers on a real TPU host for the pool
number.  Prints one JSON line.
"""
import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_workers", type=int, default=0)
    ap.add_argument("--items", type=int, default=24)
    ap.add_argument("--sparse", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-sparse benches dense [S_v,1601] targets")
    ap.add_argument("--dedup", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-dedup benches the per-candidate transport")
    ns = ap.parse_args()

    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.datasets import YTbDataset
    from youtube_vln_tpu.data.features_reader import YTbFeaturesReader
    from youtube_vln_tpu.data.loader import Loader
    from youtube_vln_tpu.data.store import get_native
    from youtube_vln_tpu.data.tokenizer import load_tokenizer

    flagship = dict(max_instruction_length=60, max_path_length=8,
                    max_num_boxes=101, min_path_length=4, min_captioned=2,
                    max_captioned=7,
                    sparse_vision_targets=ns.sparse,
                    dedup_candidates=ns.dedup and ns.sparse)
    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        paths = F.build_ytb_fixture(root, n_videos=32, frames_per_video=24,
                                    k_boxes=101, args_overrides=flagship)
        build_s = time.perf_counter() - t0

        args = F._default_args(skeleton_path=paths["skeleton_path"],
                               **flagship)
        tok = load_tokenizer(paths["vocab_path"])
        reader = YTbFeaturesReader(paths["store_path"])
        ds = YTbDataset(args=args, caption_path=paths["caption_path"],
                        tokenizer=tok, features_reader=reader,
                        masked_vision=True, masked_language=True,
                        training=True, seed=0)

        # per-item assembly (the loader-worker inner loop; items discarded
        # so allocator pressure stays realistic)
        _ = ds[0]  # warm caches (tokenizer, graph, native lib)
        n = ns.items
        t0 = time.perf_counter()
        nc = 0
        for i in range(n):
            item = ds[i % len(ds)]
            nc += int(item["opt_mask"].sum())
        dt_item = (time.perf_counter() - t0) / n

        # end-to-end Loader (assembly + collate + transport), bs=8 like
        # training.  Epoch 1 warms everything; epoch 2 is the headline —
        # this is the rate ONE worker-equivalent sustains feeding a chip.
        loader = Loader(ds, batch_size=8, shuffle=True, seed=0,
                        num_workers=ns.num_workers, drop_last=True)
        for _ in range(2):   # warm item caches AND the malloc arena
            for _ in loader:
                pass
        t0 = time.perf_counter()
        batches = rows = 0
        for batch in loader:
            batches += 1
            rows += int(batch["opt_mask"].sum())
        dt_loader = time.perf_counter() - t0

        native = get_native() is not None
        reader.close()

    cand_per_item = nc / n
    e2e = rows / dt_loader
    workers = max(1, ns.num_workers)   # 0 = in-process, one worker-equiv
    print(json.dumps({
        "metric": "loader_traj_per_s_per_worker",
        "value": round(e2e / workers, 1),
        "unit": "traj/s/worker",
        "detail": {
            "aggregate_traj_per_s": round(e2e, 1),
            "assembly_item_ms": round(dt_item * 1000, 1),
            "assembly_traj_per_s": round(cand_per_item / dt_item, 1),
            "candidates_per_item": round(cand_per_item, 2),
            "loader_batches": batches,
            "num_workers": ns.num_workers,
            "native_packer": native,
            "sparse_vision_targets": ns.sparse,
            "dedup_candidates": ns.dedup and ns.sparse,
            "fixture_build_s": round(build_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
