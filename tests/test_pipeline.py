"""Offline pipeline tests (steps 3-10 equivalents)."""
import base64
import json

import numpy as np
import pytest

from youtube_vln_tpu.pipeline import (build_dataset as B, clip_captions as C,
                                      detector as D, filters as FL,
                                      inverse_action as IA,
                                      merge_photos as M)


# --------------------------------------------------------------------------- #
# detector / TSV conversion
# --------------------------------------------------------------------------- #
def test_tsv_round_trip(tmp_path, rng):
    rows = []
    for vid, fid in (("vidA", 1), ("vidA", 2), ("vidA", 1)):  # dup key
        feats = rng.normal(size=(3, 2048)).astype(np.float32)
        boxes = rng.random((3, 4)).astype(np.float32) * 100
        probs = rng.random((3, 1601)).astype(np.float32)
        enc = lambda a: base64.b64encode(a.tobytes()).decode()
        rows.append("\t".join([
            vid, str(fid), "640", "480", "60", enc(feats), enc(boxes),
            enc(probs), "", "", "", ""]))
    tsv = tmp_path / "shard.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    store_path = tmp_path / "out.vlnstore"
    n = D.convert_tsv_to_store([tsv], store_path)
    assert n == 2  # dedup

    from youtube_vln_tpu.data.store import Store
    st = Store(store_path)
    assert set(st.keys) == {"vidA/0001", "vidA/0002"}
    assert st.get("vidA/0001").features.shape == (3, 2048)


def test_extractor_to_store(tmp_path):
    frames = tmp_path / "raw_frames" / "vid0"
    frames.mkdir(parents=True)
    img = np.zeros((48, 64, 3), np.uint8)
    loader_calls = []

    def fake_loader(path):
        loader_calls.append(path)
        return img

    for i in range(3):
        (frames / f"{i:04d}.jpg").write_bytes(b"")
    n = D.extract_to_store(tmp_path / "raw_frames", tmp_path / "s.vlnstore",
                           D.RandomProposalExtractor(num_boxes=4),
                           image_loader=fake_loader)
    assert n == 3 and len(loader_calls) == 3


# --------------------------------------------------------------------------- #
# captions
# --------------------------------------------------------------------------- #
def test_zero_shot_captions():
    d = 16
    rng = np.random.default_rng(0)
    area_emb = rng.normal(size=(len(C.AREAS), d))
    obj_emb = rng.normal(size=(len(C.OBJECTS), d))
    # frames aligned exactly with (kitchen, sink)
    ki = C.AREAS.index("kitchen")
    si = C.OBJECTS.index("sink")
    frames = np.stack([area_emb[ki] * 2 + obj_emb[si] * 2,
                       area_emb[0] * 3])
    caps = C.zero_shot_captions(frames, area_emb, obj_emb)
    assert caps[0] == "kitchen with sink"
    assert caps[1].startswith("office with")
    payload = C.caption_video_frames([3, 9], frames, area_emb, obj_emb)
    assert set(payload) == {"0003.jpg", "0009.jpg"}


# --------------------------------------------------------------------------- #
# inverse action model (JAX)
# --------------------------------------------------------------------------- #
def test_inverse_action_learns(rng):
    """Synthetic separable task: the action is encoded as a constant shift
    between feature maps; the head must beat chance decisively."""
    C_FEAT = 8

    def make_batch(bs=32):
        y = rng.integers(0, 3, size=bs)
        fk = rng.normal(size=(bs, 7, 7, C_FEAT)).astype(np.float32)
        shift = np.zeros((bs, 7, 7, C_FEAT), np.float32)
        for i, a in enumerate(y):
            shift[i, :, :, a] = 2.0
        return fk, (fk + shift).astype(np.float32), y.astype(np.int32)

    def batches():
        while True:
            yield make_batch()

    params, losses = IA.train_inverse_model(batches(), steps=60, lr=3e-3,
                                            feat_channels=C_FEAT, seed=0)
    assert losses[-1] < losses[0]
    fk, fk1, y = make_batch(64)
    import jax.numpy as jnp
    import jax
    logits = IA.inverse_forward(params, jnp.asarray(fk), jnp.asarray(fk1))
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == y))
    assert acc > 0.8, acc


def test_action_profiles(tmp_path):
    path = IA.write_action_profiles(
        tmp_path, "vid7",
        trajectories={"0": [1, 3, 5], "1": [2, 4]},
        actions_by_frame={1: "left", 3: "forward", 2: "right"},
        captions={})
    data = json.loads(path.read_text())
    assert data == [{"1": ["left"], "3": ["forward"]}, {"2": ["right"]}]


# --------------------------------------------------------------------------- #
# merge methods
# --------------------------------------------------------------------------- #
def _frames(spec):
    """spec: list of (frame_id, room, caption)"""
    return [dict(frame_id=f, room=r, caption=c) for f, r, c in spec]


def test_merge_max_window():
    frames = _frames([(i, "kitchen", "x") for i in range(6)])
    M.merge_video_frames(frames, "max", max_photo_per_merging=4)
    # frame 0: window [0,4) -> merging [0,1,2,3]
    assert frames[0]["merging"] == [0, 1, 2, 3]
    # frame 5 (late): start=2 -> [5,2,3,4]
    assert frames[5]["merging"] == [5, 2, 3, 4]
    # current frame always first
    for f in frames:
        assert f["merging"][0] == f["frame_id"]


def test_merge_all_groups_by_room():
    frames = _frames([(0, "kitchen", "x"), (1, "bedroom", "x"),
                      (2, "kitchen", "x")])
    M.merge_video_frames(frames, "all")
    assert frames[0]["merging"] == [0, 2]
    assert frames[1]["merging"] == [1]
    assert frames[2]["merging"] == [2, 0]


def test_merge_adjacent_splits_gaps():
    frames = _frames([(0, "kitchen", "x"), (1, "kitchen", "x"),
                      (5, "kitchen", "x")])
    M.merge_video_frames(frames, "adjacent")
    assert frames[0]["merging"] == [0, 1]
    assert frames[2]["merging"] == [5]


def test_merge_continue_splits_on_room_change():
    frames = _frames([(0, "kitchen", "x"), (3, "kitchen", "x"),
                      (4, "bedroom", "x"), (7, "kitchen", "x")])
    M.merge_video_frames(frames, "continue")
    assert frames[0]["merging"] == [0, 3]   # gap ok, same room
    assert frames[2]["merging"] == [4]
    assert frames[3]["merging"] == [7]      # new kitchen run


def test_merge_least_bounds_group_size():
    frames = _frames([(i, "kitchen", "" if i % 2 else "cap")
                      for i in range(9)])
    M.merge_video_frames(frames, "least", max_photo_per_merging=4)
    sizes = {}
    for f in frames:
        sizes.setdefault(tuple(sorted(f["merging"])), 0)
    assert all(len(k) <= 6 for k in sizes)  # ceil(9/4)=3 groups


# --------------------------------------------------------------------------- #
# dataset assembly + filters
# --------------------------------------------------------------------------- #
def test_assemble_records_filters():
    caps = {"v0": {"0000.jpg": ["kitchen with sink"],
                   "0001.jpg": ["bedroom with person"],
                   "0002.jpg": ["office with desk"],
                   "0003.jpg": ["porch with chair"]}}
    actions = {"v0": {0: "left", 2: "forward"}}
    indoor = {"v0": [0, 1, 2]}            # frame 3 fails places365
    mask = {"v0": {"indoor_locs": ["0000.jpg", "0001.jpg", "0002.jpg"],
                   "person_locs": []}}
    recs = B.assemble_records(["v0"], caps, actions, indoor, mask)
    ids = [r["frame_id"] for r in recs]
    assert ids == [0, 2]                  # 1 dropped (person), 3 (outdoor)
    assert recs[0]["caption"] == "kitchen with sink"
    assert recs[0]["action"] == "left"


def test_split_and_freeze(tmp_path):
    recs = [{"video_id": f"v{i}", "frame_id": j,
             "caption": "kitchen with sink" if j % 2 == 0 else "",
             "action": "forward", "merging": [j]}
            for i in range(4) for j in range(10)]
    train, test = B.split_train_test(recs, test_rate=0.25, seed=0)
    assert {r["video_id"] for r in train} & {r["video_id"] for r in test} \
        == set()
    assert len(train) + len(test) == len(recs)

    # freeze a testset through the live dataset samplers
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.datasets import YTbDataset
    from youtube_vln_tpu.data.features_reader import YTbFeaturesReader
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    paths = F.build_ytb_fixture(tmp_path / "ytb")
    tok = load_tokenizer(paths["vocab_path"])
    reader = YTbFeaturesReader(paths["store_path"])
    args = F._default_args(skeleton_path=paths["skeleton_path"])
    ds = YTbDataset(args=args, caption_path=paths["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=False, masked_language=False,
                    training=True, seed=0)
    out = B.freeze_testset(ds, tmp_path / "frozen.json")
    frozen = json.loads(out.read_text())
    assert len(frozen) == len(ds.listing_ids)
    for entry in frozen.values():
        assert len(entry) == 5
    reader.close()
