"""Smoke tests for the thin CLI wrappers in scripts/.

The underlying library functions are unit/parity-tested elsewhere; these
pin the argparse plumbing + wiring (a renamed kwarg or moved symbol in the
library surface should fail HERE, not on a user's box)."""
import importlib.util
import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        f"script_{name}", REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_merge_photos_main(tmp_path):
    items = [{"video_id": "v0", "frame_id": i,
              "caption": "kitchen with sink" if i % 2 == 0 else "",
              "action": "", "room": "kitchen"} for i in range(5)]
    src = tmp_path / "src.json"
    out = tmp_path / "out.json"
    src.write_text(json.dumps(items))
    _load_script("merge_photos").main(
        ["--source", str(src), "--output", str(out),
         "--merge_method", "least", "--max_photo_per_merging", "3"])
    merged = json.loads(out.read_text())
    assert len(merged) == 5
    for rec in merged:
        assert rec["merging"][0] == rec["frame_id"]  # current frame first


def test_convert_tsv_main(tmp_path):
    import base64
    import csv

    from youtube_vln_tpu.data.store import Store

    rng = np.random.default_rng(0)
    tsv = tmp_path / "shard.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for fid in (1, 2):
            feats = rng.normal(size=(4, 2048)).astype(np.float32)
            boxes = rng.uniform(0, 100, (4, 4)).astype(np.float32)
            probs = rng.random((4, 1601)).astype(np.float32)
            w.writerow(["vid0", fid, 640, 480, 0,
                        base64.b64encode(feats.tobytes()).decode(),
                        base64.b64encode(boxes.tobytes()).decode(),
                        base64.b64encode(probs.tobytes()).decode(),
                        "", "", "", ""])
    out = tmp_path / "out.vlnstore"
    _load_script("convert_tsv").main([str(out), str(tsv)])
    store = Store(out)
    try:
        assert sorted(store.keys) == ["vid0/0001", "vid0/0002"]
    finally:
        store.close()


def _write_frames_tree(root, vids=("vid0",), frames=2):
    from PIL import Image
    rng = np.random.default_rng(0)
    for vid in vids:
        d = root / vid
        d.mkdir(parents=True)
        for i in range(1, frames + 1):
            arr = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / ("%04d.jpg" % i))


def test_extract_features_main(tmp_path):
    frames = tmp_path / "raw_frames"
    _write_frames_tree(frames)
    out = tmp_path / "img_features"
    mod = _load_script("extract_features")
    mod.main([str(frames), str(out), "--num_splits", "2",
              "--num_workers", "0"])
    shards = sorted(out.glob("*.tsv*"))
    assert shards, "extraction produced no TSV shards"


def test_clip_features_main(tmp_path):
    frames = tmp_path / "raw_frames"
    _write_frames_tree(frames)
    out = tmp_path / "clip.tsv"
    _load_script("clip_features").main([str(frames), str(out)])
    text = out.read_text().strip().splitlines()
    assert len(text) == 2  # one row per frame
    assert text[0].split("\t")[0] == "vid0"


def test_merge_stores_main(tmp_path):
    from youtube_vln_tpu.data.store import Store, StoreRecord, \
        StoreWriter

    rng = np.random.default_rng(0)

    def _write(path, key):
        with StoreWriter(path) as w:
            w.add(key, StoreRecord(2, 64, 48,
                                   rng.normal(size=(2, 2048)).astype(
                                       np.float32),
                                   rng.uniform(0, 10, (2, 4)).astype(
                                       np.float32),
                                   rng.random((2, 1601)).astype(np.float32)))

    a, b = tmp_path / "a.vlnstore", tmp_path / "b.vlnstore"
    _write(a, "v/0001")
    _write(b, "v/0002")
    merged = tmp_path / "m.vlnstore"
    _load_script("merge_stores").main([str(merged), str(a), str(b)])
    store = Store(merged)
    try:
        assert sorted(store.keys) == ["v/0001", "v/0002"]
    finally:
        store.close()
