"""Data layer tests: store, readers, tokenizer, sampling, datasets, loader."""
import numpy as np
import pytest

from youtube_vln_tpu.config import RunConfig
from youtube_vln_tpu.data import fixtures as F
from youtube_vln_tpu.data import instructions as I
from youtube_vln_tpu.data import sampling as S
from youtube_vln_tpu.data.features_reader import (
    PanoFeaturesReader, YTbFeaturesReader)
from youtube_vln_tpu.data.loader import Loader, collate, shard_indices
from youtube_vln_tpu.data.store import Store, get_native
from youtube_vln_tpu.data.tokenizer import WordPieceTokenizer
from youtube_vln_tpu.data.datasets import BeamDataset, YTbDataset


# --------------------------------------------------------------------------- #
# store
# --------------------------------------------------------------------------- #
def test_store_round_trip(tmp_path):
    path = tmp_path / "s.vlnstore"
    F.write_store(path, ["a", "b/0001"], k_boxes=3, seed=1)
    st = Store(path)
    assert set(st.keys) == {"a", "b/0001"}
    rec = st.get("a")
    assert rec.features.shape == (3, 2048)
    assert rec.boxes.shape == (3, 4)
    assert rec.cls_prob.shape == (3, 1601)
    assert not rec.is_pano
    with pytest.raises(KeyError):
        st.get("missing")
    st.close()


def test_store_writer_drops_partial_file_on_exception(tmp_path):
    """A converter dying mid-write must NOT leave a valid-looking store:
    close() finalizes header+index for however many records landed, and a
    truncated store that parses cleanly is silently served by every
    reader (r5 review finding — an 80 GB lmdb conversion dying halfway
    would then 'work' with most viewpoints missing).  On exception the
    partial file is removed so re-runs start from the source."""
    from youtube_vln_tpu.data.store import StoreWriter

    path = tmp_path / "partial.vlnstore"
    rec = F._random_record(np.random.default_rng(0), 2, False)
    with pytest.raises(RuntimeError, match="mid-conversion"):
        with StoreWriter(path) as w:
            w.add("a", rec)
            raise RuntimeError("mid-conversion failure")
    assert not path.exists()

    # the success path still finalizes normally
    with StoreWriter(path) as w:
        w.add("a", rec)
    st = Store(path)
    assert set(st.keys) == {"a"}
    st.close()


def test_store_pano_fields(tmp_path):
    path = tmp_path / "p.vlnstore"
    F.write_store(path, ["scan0-vp0"], k_boxes=4, pano=True, seed=2)
    st = Store(path)
    rec = st.get("scan0-vp0")
    assert rec.is_pano
    assert rec.view_heading.shape == (36,)
    assert rec.feat_heading.shape == (4,)
    st.close()


def test_store_rejects_corrupt_offsets(tmp_path):
    """A bit-rotted / post-hoc-truncated index must fail at open in BOTH
    readers — not hand out-of-bounds pointers to the C packers."""
    import ctypes
    import struct
    from youtube_vln_tpu.data.store import _HEADER

    path = tmp_path / "c.vlnstore"
    F.write_store(path, ["a", "b"], k_boxes=2, seed=4)
    raw = bytearray(path.read_bytes())
    (index_offset,) = struct.unpack_from("<Q", raw, _HEADER.size - 8)
    # first index entry: u16 klen | key | u64 offset -> point the offset
    # past the body region
    klen = struct.unpack_from("<H", raw, index_offset)[0]
    struct.pack_into("<Q", raw, index_offset + 2 + klen, len(raw) + 1024)
    bad = tmp_path / "bad.vlnstore"
    bad.write_bytes(bytes(raw))

    with pytest.raises(ValueError, match="outside body region"):
        Store(bad)
    native = get_native()
    if native is not None:
        assert not native.vlnstore_open(str(bad).encode())


def test_native_pack_rejects_corrupt_num_boxes(tmp_path):
    """A corrupt record header (huge K) must make the native packers
    decline (python fallback then raises on the short buffer) instead of
    an out-of-bounds memcpy."""
    import struct
    from youtube_vln_tpu.data.store import _HEADER

    native = get_native()
    if native is None:
        pytest.skip("native reader not built")
    path = tmp_path / "k.vlnstore"
    F.write_store(path, ["a"], k_boxes=2, seed=5)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<I", raw, _HEADER.size, 2 ** 20)  # record 0's K field
    bad = tmp_path / "badk.vlnstore"
    bad.write_bytes(bytes(raw))

    st = Store(bad)
    assert st._handle  # open succeeds: the index itself is intact
    assert st.pack_path([("a",)], max_steps=1, max_boxes=8) is None
    assert st.pack_path_f16([("a",)], max_steps=1, max_boxes=8) is None
    with pytest.raises(ValueError):  # python fallback is loud, not OOB
        st.get("a")
    st.close()

    # same for the pano packers (separate extent check incl. the tail)
    ppath = tmp_path / "p.vlnstore"
    F.write_store(ppath, ["v"], k_boxes=2, pano=True, seed=6)
    raw = bytearray(ppath.read_bytes())
    struct.pack_into("<I", raw, _HEADER.size, 2 ** 20)
    badp = tmp_path / "badp.vlnstore"
    badp.write_bytes(bytes(raw))
    stp = Store(badp)
    assert stp.pack_pano_path(["v"], [0.0], [0.0], max_steps=1,
                              max_boxes=8) is None
    assert stp.pack_pano_steps_f16(["v"], [0.0], [0.0], [0],
                                   max_boxes=8) is None
    stp.close()


def test_store_rejects_wrapping_offset_and_corrupt_n_records(tmp_path):
    """Two open-time hardening regressions: a record offset near
    UINT64_MAX must not pass the native bounds check via unsigned wrap
    (the addition form `off + sizeof(RecHeader)` wrapped to a small
    value), and a garbage n_records must make the native open DECLINE
    (nullptr) instead of throwing std::length_error through the C ABI
    (std::terminate kills the training process)."""
    import struct
    from youtube_vln_tpu.data.store import _HEADER

    path = tmp_path / "s.vlnstore"
    F.write_store(path, ["a", "b"], k_boxes=2, seed=7)
    native = get_native()

    raw = bytearray(path.read_bytes())
    (index_offset,) = struct.unpack_from("<Q", raw, _HEADER.size - 8)
    klen = struct.unpack_from("<H", raw, index_offset)[0]
    struct.pack_into("<Q", raw, index_offset + 2 + klen, 2 ** 64 - 8)
    wrap = tmp_path / "wrap.vlnstore"
    wrap.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="outside body region"):
        Store(wrap)
    if native is not None:
        assert not native.vlnstore_open(str(wrap).encode())

    raw = bytearray(path.read_bytes())
    struct.pack_into("<Q", raw, _HEADER.size - 16, 2 ** 60)  # n_records
    nrec = tmp_path / "nrec.vlnstore"
    nrec.write_bytes(bytes(raw))
    if native is not None:
        assert not native.vlnstore_open(str(nrec).encode())
    with pytest.raises((ValueError, struct.error)):  # python: loud
        Store(nrec)


def test_readers_reject_extent_into_neighbor_record(tmp_path):
    """A moderately corrupt num_boxes whose derived extent stays inside
    the FILE — crossing into the NEXT record's bytes — must make both
    readers decline loudly, not silently serve the neighbor's bytes as
    this record's features.  Record extents are bounded by the next
    record's start (the tightest provable end), not just by the index
    start."""
    import struct
    from youtube_vln_tpu.data.store import _HEADER

    path = tmp_path / "x.vlnstore"
    F.write_store(path, ["a", "b", "c"], k_boxes=2, seed=8)
    raw = bytearray(path.read_bytes())
    # record 0 ("a"): K 2 -> 3.  One extra box = 4*(2048+4+1601) = 14612 B,
    # record "b" is 29256 B, so the corrupt extent ends INSIDE record "b" —
    # the silent-corruption geometry a whole-body bound cannot see.
    struct.pack_into("<I", raw, _HEADER.size, 3)
    bad = tmp_path / "badext.vlnstore"
    bad.write_bytes(bytes(raw))

    st = Store(bad)
    with pytest.raises(ValueError, match="extends past its record region"):
        st.get("a")
    if get_native() is not None and st._handle:
        assert st.pack_path([("a",)], max_steps=1, max_boxes=8) is None
    rec = st.get("b")  # intact neighbors still read fine
    assert rec.features.shape == (2, 2048)
    st.close()


def test_multi_shard_warning_names_missing_native_lib(tmp_path, caplog,
                                                      monkeypatch):
    """When libvlnstore.so is not built, the cross-shard warning must NOT
    send the operator on a pointless merge_stores run — the fast path is
    missing because of the library, not the shard layout."""
    import logging
    from youtube_vln_tpu.data import store as store_mod

    p1, p2 = tmp_path / "s1.vlnstore", tmp_path / "s2.vlnstore"
    F.write_store(p1, ["a"], k_boxes=2, seed=1)
    F.write_store(p2, ["b"], k_boxes=2, seed=2)
    reader = YTbFeaturesReader([p1, p2])
    monkeypatch.setattr(store_mod, "get_native", lambda: None)
    with caplog.at_level(logging.WARNING):
        reader._warn_multi_shard()
    assert "make -C native" in caplog.text
    assert "merge_stores" not in caplog.text
    reader.close()


def test_merge_stores_last_shard_wins_and_restores_native_path(tmp_path,
                                                               caplog):
    """scripts/merge_stores collapses a sharded layout (11x convert_lmdb of
    the reference databases) into one store: key overlap resolves
    last-shard-wins exactly like the multi-shard reader, and the native
    path packer — which declines cross-shard paths with a one-time
    warning — engages again on the merged store."""
    import logging
    from youtube_vln_tpu.data.store import merge_stores

    a, b = tmp_path / "a.vlnstore", tmp_path / "b.vlnstore"
    F.write_store(a, ["k0", "k1", "dup"], k_boxes=3, seed=10)
    F.write_store(b, ["k2", "dup"], k_boxes=2, seed=11)
    merged_path = tmp_path / "m.vlnstore"
    n = merge_stores([a, b], merged_path)
    assert n == 4  # dup written once (shard b's copy)

    sharded = YTbFeaturesReader([a, b])
    merged = YTbFeaturesReader(merged_path)
    assert set(sharded.keys) == set(merged.keys)
    for key in ("k0", "k2", "dup"):
        for x, y in zip(sharded[(key,)], merged[(key,)]):
            np.testing.assert_array_equal(x, y)

    # a cross-shard path declines the native packer (warned once), the
    # merged store packs it natively — and both produce the same arrays
    # via the dataset-level fallback contract (None -> python path)
    with caplog.at_level(logging.WARNING):
        assert sharded.pack_path([("k0",), ("k2",)], 2, 4) is None
    assert any("merge_stores" in r.message for r in caplog.records)
    out = merged.pack_path([("k0",), ("k2",)], 2, 4)
    if get_native() is not None:
        assert out is not None
    sharded.close()
    merged.close()

    # pano records: the orientation tail must survive the merge
    pa = tmp_path / "pa.vlnstore"
    F.write_store(pa, ["s-v0"], k_boxes=3, pano=True, seed=12)
    pm = tmp_path / "pm.vlnstore"
    assert merge_stores([pa], pm) == 1
    from youtube_vln_tpu.data.store import Store
    src, dst = Store(pa), Store(pm)
    r0, r1 = src.get("s-v0"), dst.get("s-v0")
    np.testing.assert_array_equal(r0.features, r1.features)
    np.testing.assert_array_equal(r0.feat_heading, r1.feat_heading)
    np.testing.assert_array_equal(r0.view_elevation, r1.view_elevation)
    src.close()
    dst.close()


def test_native_reader_available_and_consistent(tmp_path):
    native = get_native()
    assert native is not None, "libvlnstore.so not built (run make -C native)"
    path = tmp_path / "n.vlnstore"
    F.write_store(path, [f"k{i}" for i in range(10)], k_boxes=2, seed=3)
    st = Store(path)
    assert st._handle, "native handle not used"
    rec = st.get("k7")
    assert rec.features.shape == (2, 2048)
    st.close()


# --------------------------------------------------------------------------- #
# readers
# --------------------------------------------------------------------------- #
def test_region_reader_global_feature(tmp_path):
    path = tmp_path / "r.vlnstore"
    F.write_store(path, ["v/0000", "v/0001"], k_boxes=3, seed=4)
    reader = YTbFeaturesReader(path)
    feats, locs, probs = reader[("v/0000", "v/0001")]
    assert feats.shape == (7, 2048)      # 2*3 regions + global
    assert locs.shape == (7, 11)
    np.testing.assert_allclose(feats[0], feats[1:].mean(0), rtol=1e-5)
    np.testing.assert_array_equal(locs[0], [0, 0, 1, 1, 1, 0, 1, 0, 1, 0, 1])
    np.testing.assert_allclose(probs[0], 1 / 1601)
    # non-pano orientation cols stay at 1 (reference features_reader.py:110)
    assert np.all(locs[1:, 5:] == 1.0)
    reader.close()


def test_pano_reader_orientation(tmp_path):
    path = tmp_path / "p2.vlnstore"
    F.write_store(path, ["scan0-vpA"], k_boxes=5, pano=True, seed=5)
    reader = PanoFeaturesReader(path)
    assert reader.viewpoints == {"scan0": {"vpA"}}
    heading, next_heading = 0.3, -0.2
    feats, locs, probs = reader[("scan0-vpA", heading, next_heading)]
    assert feats.shape == (6, 2048)
    rec = Store(path).get("scan0-vpA")
    np.testing.assert_allclose(locs[1:, 5],
                               np.sin(rec.feat_heading - heading), rtol=1e-5)
    np.testing.assert_allclose(locs[1:, 9],
                               np.sin(rec.feat_heading - next_heading),
                               rtol=1e-5)
    np.testing.assert_allclose(locs[0, 6], np.cos(-heading), rtol=1e-6)
    reader.close()


# --------------------------------------------------------------------------- #
# tokenizer
# --------------------------------------------------------------------------- #
def test_wordpiece_tokenizer(tmp_path):
    tok = F.write_fixture_vocab(tmp_path / "vocab.txt")
    assert tok.vocab["[PAD]"] == 0
    assert tok.vocab["[CLS]"] == 101
    assert tok.vocab["[SEP]"] == 102
    assert tok.vocab["[MASK]"] == 103
    toks = tok.tokenize("Walk into the KITCHEN.")
    assert toks == ["walk", "into", "the", "kitchen", "."]
    # unknown word -> [UNK]
    assert tok.tokenize("zzzqqq") == ["[UNK]"]


def test_wordpiece_subwords():
    vocab = {"[UNK]": 0, "play": 1, "##ing": 2, "##s": 3}
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("playing plays play") == \
        ["play", "##ing", "play", "##s", "play"]


def test_tokenizer_matches_hf_on_cjk_and_brackets(tmp_path):
    """Parity vs the REAL HF BertTokenizer on the two divergence-prone
    inputs: CJK ideographs (HF space-isolates each codepoint before
    wordpiece) and bracketed non-special vocab entries like [unused0]
    (HF never-splits ONLY the five special tokens)."""
    transformers = pytest.importorskip("transformers")

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[unused0]",
             "walk", "left", "[", "]", "unused", "##0", "走", "into",
             "the", "##ft"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    hf = transformers.BertTokenizer(str(p), do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(p)
    for text in ("走left walk", "press [unused0] now", "走走 into the",
                 "[MASK] walk [SEP]", "walk [ unused ] le走ft"):
        assert ours.tokenize(text) == hf.tokenize(text), text


# --------------------------------------------------------------------------- #
# sampling
# --------------------------------------------------------------------------- #
def test_shufflers():
    import random
    rng = random.Random(0)
    seq = [0, 1, 2, 3]
    outs = [s for _, s in zip(range(5), S.shuffle_different(seq, rng))]
    assert all(o != seq and sorted(o) == seq for o in outs)
    outs = list(S.shuffle_non_adjacent(seq, rng))
    for o in outs:
        diff = [i for i in range(4) if o[i] != seq[i]]
        assert len(diff) == 2 and abs(diff[0] - diff[1]) > 1
    outs = [s for _, s in zip(range(4), S.shuffle_two(seq, rng))]
    for o in outs:
        assert sorted(o) == seq and sum(a != b for a, b in zip(o, seq)) == 2


def test_negative_generation_shapes():
    import random
    rng = random.Random(0)
    frames = {f"v{i}": [{"frame_id": j, "caption": "" if j % 2 else "x",
                         "merging": [j]} for j in range(8)]
              for i in range(3)}
    positive = [("v0", (0,)), ("v0", (1,)), ("v0", (2,)), ("v0", (4,))]
    states = [True, False, True, True]
    negs = S.generate_negatives(
        positive, states, list(frames), frames, {}, 2,
        S.shuffle_different, "ytb", False, "normal", rng)
    neg_captions, neg_images, neg_randoms, order_labels = negs
    assert len(neg_captions) == len(neg_images) == len(neg_randoms) == 2
    for traj in neg_captions + neg_images + neg_randoms:
        assert len(traj) == len(positive)
    assert order_labels["normal_idx"] == [0, 1, 2, 3]
    # caption negatives keep the multiset of frames (shuffles + refills)
    for traj in neg_captions:
        assert sorted(traj) == sorted(positive)
        assert traj != positive


def test_negative_generation_traj_judge():
    import random
    rng = random.Random(1)
    frames = {f"v{i}": [{"frame_id": j,
                         "caption": "" if j % 2 else "room with bed",
                         "merging": [j]} for j in range(8)]
              for i in range(3)}
    positive = [("v0", (0,)), ("v0", (1,)), ("v0", (2,)), ("v0", (4,))]
    states = [True, False, True, True]
    neg_captions, neg_images, neg_randoms, _ = S.generate_negatives(
        positive, states, list(frames), frames, {}, 2,
        S.shuffle_different, "ytb", True, "normal", rng)
    captioned = [p for p, s in zip(positive, states) if s]
    for traj in neg_captions:
        # captioned frames keep their relative order
        kept = [t for t in traj if t in captioned]
        assert kept == captioned
        assert traj != positive


# --------------------------------------------------------------------------- #
# YTb dataset end-to-end
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def ytb_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytb")
    paths = F.build_ytb_fixture(root)
    return paths


def _ytb_args(**kw):
    # reference-shaped dense transport unless a test opts in: the layout
    # assertions here were written against the reference item shapes, and
    # the sparse/dedup layouts carry their own explicit-flag tests below
    # (the r4 RunConfig DEFAULT is sparse+dedup — pinned by
    # test_dedup_follows_sparse_default)
    base = dict(
        pretrain=True, pre_dataset="ytb", ranking=True, masked_vision=True,
        masked_language=True, max_instruction_length=32, max_path_length=4,
        max_num_boxes=5, min_path_length=3, min_captioned=2, max_captioned=4,
        num_negatives=2, shuffler="different", negative_style="normal",
        sparse_vision_targets=False)
    base.update(kw)
    return RunConfig(**base)


def test_ytb_dataset_train_sample(ytb_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    assert len(ds) > 0
    assert ds.num_candidates() == 7       # 1 + 3*2
    s = ds[0]
    S_v = args.max_path_length * args.max_num_boxes
    assert s["image_features"].shape == (7, S_v, 2048)
    assert s["image_locations"].shape == (7, S_v, 12)
    assert s["instr_tokens"].shape == (7, 32)
    assert s["opt_mask"].all()
    assert s["ranking_target"].shape == ()
    # step index in location col 11
    steps = s["image_locations"][0, :, 11].reshape(4, 5)
    np.testing.assert_array_equal(steps, np.tile(
        np.arange(4)[:, None], (1, 5)))
    # CLS at position 0 of the (unmasked or masked) instruction
    assert (s["instr_targets"] >= -1).all()
    reader.close()


def test_ytb_dataset_eval_uses_frozen_testset(ytb_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    ds = YTbDataset(args=args, caption_path=ytb_env["test_caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=False, masked_language=False,
                    training=False,
                    testset_path={"ranking": ytb_env["testset_path"]},
                    seed=0)
    s1 = ds[0]
    s2 = ds[0]
    assert (s1["ranking_target"] == s2["ranking_target"]).all()
    assert s1["ranking_target"][0] == 1 and s1["ranking_target"][1:].sum() == 0
    np.testing.assert_array_equal(s1["image_features"], s2["image_features"])
    reader.close()


# --------------------------------------------------------------------------- #
# Beam dataset end-to-end
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def r2r_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("r2r")
    return F.build_r2r_fixture(root)


def _beam_args(**kw):
    base = dict(
        pretrain=False, ranking=True, batch_size=2,
        max_instruction_length=32, max_path_length=4, max_num_boxes=5,
        num_negatives=2, num_beams=4, num_beams_train=3)
    base.update(kw)
    return RunConfig(**base)


def test_beam_dataset_train(r2r_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    args = _beam_args()
    ds = BeamDataset(
        args, f"{r2r_env['data_dir']}/task/R2R_train.json",
        f"{r2r_env['data_dir']}/beamsearch/beams_train.json",
        tok, reader, num_beams=args.num_beams_train, num_beams_strict=False,
        training=True, masked_vision=False, masked_language=False,
        shuffle_visual_features=False, data_dir=r2r_env["data_dir"], seed=0)
    assert len(ds) > 0
    s = ds[0]
    nc = args.num_beams_train
    S_v = args.max_path_length * args.max_num_boxes
    assert s["image_features"].shape == (nc, S_v, 2048)
    assert s["ranking_target"] in (np.int32(0), np.int32(-1))
    reader.close()


@pytest.mark.parametrize("dedup", [False, True], ids=["dense", "dedup"])
def test_beam_dataset_eval_tiles_to_num_beams(r2r_env, dedup):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    args = _beam_args(dedup_beam_steps=dedup)
    ds = BeamDataset(
        args, f"{r2r_env['data_dir']}/task/R2R_val_unseen.json",
        f"{r2r_env['data_dir']}/beamsearch/beams_val_unseen.json",
        tok, reader, num_beams=args.num_beams, num_beams_strict=False,
        training=False, masked_vision=False, masked_language=False,
        shuffle_visual_features=False, data_dir=r2r_env["data_dir"], seed=0)
    s = ds[0]
    assert s["ranking_target"].shape == (args.num_beams,)
    assert s["ranking_target"][0] == 1.0   # beam 0 is the gt path (fixture)
    assert s["instr_id"].shape == (2,)
    reader.close()


def _beam_eval_pair(r2r_env, **kw):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    mk = lambda **a: BeamDataset(
        _beam_args(**a, **kw),
        f"{r2r_env['data_dir']}/task/R2R_val_unseen.json",
        f"{r2r_env['data_dir']}/beamsearch/beams_val_unseen.json",
        tok, reader, num_beams=4, num_beams_strict=False,
        training=False, masked_vision=False, masked_language=False,
        shuffle_visual_features=False, data_dir=r2r_env["data_dir"], seed=0)
    return mk(dedup_beam_steps=False), mk(dedup_beam_steps=True), reader


def test_beam_step_dedup_item_expands_to_dense(r2r_env):
    """The step-dedup eval item, host-expanded, must equal the dense item
    BIT-EXACTLY (the dedup key (viewpoint, heading, next_heading, step) is
    exactly the reader-call signature + assembler padding)."""
    dense_ds, dedup_ds, reader = _beam_eval_pair(r2r_env)
    assert not dense_ds.step_dedup and dedup_ds.step_dedup
    for i in range(2):
        dense_ds.reseed(7)
        dense = dense_ds[i]
        dedup_ds.reseed(7)
        dedup = dedup_ds[i]
        idx = dedup["step_index"]
        nc, L = idx.shape
        n_u = dedup["uniq_step_features"].shape[0]
        assert idx.max() < n_u
        # bucket-padded, but never past the dense slot count (else small
        # geometries would ship MORE bytes than the dense layout)
        assert n_u % BeamDataset.STEP_BUCKET == 0 or n_u == nc * L
        assert n_u <= nc * L
        B = dedup["uniq_step_features"].shape[1]
        for uk, dk in (("uniq_step_features", "image_features"),
                       ("uniq_step_locations", "image_locations"),
                       ("uniq_step_mask", "image_mask")):
            exp = dedup[uk][idx].reshape((nc, L * B)
                                         + dedup[uk].shape[2:])
            np.testing.assert_array_equal(exp, dense[dk], err_msg=uk)
        for k in ("instr_tokens", "instr_mask", "instr_targets",
                  "segment_ids", "ranking_target", "opt_mask", "instr_id"):
            np.testing.assert_array_equal(dedup[k], dense[k], err_msg=k)
        # the transport saving is real on this fixture: beams share steps
        assert (idx.size - len(np.unique(idx))) > 0
    reader.close()


def test_beam_step_dedup_scores_match(r2r_env):
    """Scores through the jitted scorer are identical whether the batch
    arrives dense or step-dedup + in-graph expanded (test.py protocol)."""
    import jax
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.evaluation.beam_eval import build_score_step
    from youtube_vln_tpu.models import init_lily_params

    dense_ds, dedup_ds, reader = _beam_eval_pair(r2r_env)
    cfg = tiny_config(v_feature_size=2048, ranking=True)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    step = build_score_step(cfg)
    scores = {}
    for name, ds in (("dense", dense_ds), ("dedup", dedup_ds)):
        loader = Loader(ds, batch_size=1, shuffle=False, drop_last=False,
                        with_instr_id=True)
        batch = next(iter(loader))
        if name == "dedup":
            assert "uniq_step_features" in batch
            assert "image_features" not in batch
        scores[name] = np.asarray(step(params, batch))
    np.testing.assert_allclose(scores["dedup"], scores["dense"],
                               rtol=0, atol=1e-6)
    reader.close()


def test_beam_step_dedup_collate_mixed_buckets(r2r_env):
    """bs > 1 with different per-item unique counts pads uniq_step_* to
    the batch max (collate's max-over-samples fallback)."""
    from youtube_vln_tpu.data.loader import collate
    _, dedup_ds, reader = _beam_eval_pair(r2r_env)
    items = [dedup_ds[0], dedup_ds[1 % len(dedup_ds)]]
    # force unequal uniq dims by trimming one item's pad rows
    items[1] = dict(items[1])
    for k in ("uniq_step_features", "uniq_step_locations",
              "uniq_step_mask"):
        items[1][k] = items[1][k][: items[1]["step_index"].max() + 1]
    nc = max(it["step_index"].shape[0] for it in items)
    batch = collate(items, nc, with_instr_id=True)
    n0 = batch["uniq_step_features"].shape[1]
    assert n0 == max(it["uniq_step_features"].shape[0] for it in items)
    assert batch["step_index"].shape == (2, nc,
                                         items[0]["step_index"].shape[1])
    reader.close()


def test_beam_step_dedup_worker_pool(r2r_env):
    """--dedup_beam_steps batches must survive the fork-pool shm path
    unchanged (worker-count deterministic) WITHOUT pickle fallbacks:
    the slab is sized from probes spread across the epoch, so items in
    a larger uniq-step bucket than item 0 still fit."""
    _, dedup_ds, reader = _beam_eval_pair(r2r_env)
    batches = {}
    loaders = {}
    for nw in (0, 2):
        loaders[nw] = Loader(dedup_ds, batch_size=2, shuffle=False,
                             drop_last=False, with_instr_id=True,
                             num_workers=nw)
        batches[nw] = list(loaders[nw])
    assert len(batches[0]) == len(batches[2]) > 0
    assert "uniq_step_features" in batches[0][0]
    for b0, b2 in zip(batches[0], batches[2]):
        assert set(b0) == set(b2)
        for k in b0:
            np.testing.assert_array_equal(b0[k], b2[k], err_msg=k)
    # pin the SLAB SIZING only: slot_timeout fallbacks are the documented
    # imap slot-starvation degrade (fires under CPU contention, e.g. a
    # loaded test box) and deliver identical data — the array_equal loop
    # above already covers them
    assert loaders[2].shm_fallbacks_by_reason.get("slab_overflow", 0) == 0
    reader.close()


def test_beam_dense_worker_pool(r2r_env):
    """Dense beam-eval batches (which now assemble through the batched
    native f16 packer) must survive the fork-pool shm path unchanged.
    No zero-fallback assert: items are constant-size here, so a fallback
    can only be the documented slot-starvation degrade (free-queue
    timeout under CPU contention), which still delivers identical
    data — exactly what this test pins."""
    dense_ds, _, reader = _beam_eval_pair(r2r_env)
    batches = {}
    for nw in (0, 2):
        loader = Loader(dense_ds, batch_size=2, shuffle=False,
                        drop_last=False, with_instr_id=True,
                        num_workers=nw)
        batches[nw] = list(loader)
    assert len(batches[0]) == len(batches[2]) > 0
    assert batches[0][0]["image_features"].dtype == np.float16
    for b0, b2 in zip(batches[0], batches[2]):
        assert set(b0) == set(b2)
        for k in b0:
            np.testing.assert_array_equal(b0[k], b2[k], err_msg=k)
    reader.close()


def test_beam_dataset_traj_judge_train(r2r_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    args = _beam_args(ranking=False, traj_judge=True,
                      shuffle_visual_features=True)
    ds = BeamDataset(
        args, f"{r2r_env['data_dir']}/task/R2R_train.json",
        f"{r2r_env['data_dir']}/beamsearch/beams_train.json",
        tok, reader, num_beams=args.num_beams_train, num_beams_strict=False,
        training=True, masked_vision=False, masked_language=False,
        shuffle_visual_features=True, data_dir=r2r_env["data_dir"], seed=0)
    for i in range(3):  # exercise all shuffle types across seeds
        s = ds[i % len(ds)]
        assert s["image_features"].shape[0] == 1 + args.num_negatives
    reader.close()


# --------------------------------------------------------------------------- #
# loader
# --------------------------------------------------------------------------- #
def test_shard_indices_exhaustive():
    idx = [shard_indices(10, shuffle=True, seed=1, epoch=0, num_shards=4,
                         shard=s) for s in range(4)]
    allidx = np.concatenate(idx)
    assert len(allidx) == 12              # padded by wrapping
    assert set(allidx) == set(range(10))
    # different epoch -> different order
    a = shard_indices(10, shuffle=True, seed=1, epoch=0)
    b = shard_indices(10, shuffle=True, seed=1, epoch=1)
    assert not np.array_equal(a, b)


def test_loader_batches(ytb_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["image_features"].shape[:2] == (2, 7)
    assert b["instr_tokens"].shape == (2, 7, 32)
    assert b["opt_mask"].shape == (2, 7)
    reader.close()


def test_collate_pads_candidates():
    s1 = dict(
        ranking_target=np.zeros(3, np.float32),
        image_features=np.ones((3, 4, 8), np.float32),
        image_locations=np.ones((3, 4, 12), np.float32),
        image_mask=np.ones((3, 4), np.int32),
        image_targets=np.ones((3, 4, 5), np.float32),
        image_targets_mask=np.ones((3, 4), np.int32),
        instr_tokens=np.ones((3, 6), np.int32),
        instr_mask=np.ones((3, 6), np.int32),
        instr_targets=np.ones((3, 6), np.int32),
        segment_ids=np.zeros((3, 6), np.int32),
        opt_mask=np.ones(3, bool),
        instr_id=np.zeros(2, np.int64),
    )
    batch = collate([s1], nc=5, with_instr_id=True)
    assert batch["opt_mask"].shape == (1, 5)
    assert batch["opt_mask"][0].sum() == 3
    assert batch["image_features"].shape == (1, 5, 4, 8)
    assert batch["ranking_target"].shape == (1, 5)


def test_loader_worker_determinism(ytb_env):
    """num_workers must not change the sampled batches (per-item seeding)."""
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    batches = {}
    for nw in (0, 2):
        loader = Loader(ds, batch_size=2, shuffle=True, seed=3,
                        num_workers=nw)
        batches[nw] = list(loader)
    assert len(batches[0]) == len(batches[2])
    for b0, b2 in zip(batches[0], batches[2]):
        for k in b0:
            np.testing.assert_array_equal(b0[k], b2[k], err_msg=k)
    reader.close()


def test_native_pack_path_matches_python(ytb_env):
    """The C++ path packer (native/vlnstore.cc:vlnstore_pack_path) must
    reproduce reader[keys] + pad_step + stack exactly (global region,
    box normalization, truncation, padding, step column)."""
    from youtube_vln_tpu.data.datasets import _PathFeatureAssembler

    reader = YTbFeaturesReader(ytb_env["store_path"])
    keys = sorted(reader.keys)
    step_keys = [(keys[0], keys[1]), (keys[2],),
                 (keys[3], keys[4], keys[5])]
    packed = reader.pack_path(step_keys, max_steps=4, max_boxes=5)
    if packed is None:
        pytest.skip("native library not built")
    f, l, p, m = packed

    asm = _PathFeatureAssembler(4, 5)
    steps = [asm.pad_step(*reader[k], i) for i, k in enumerate(step_keys)]
    f2, l2, p2, m2 = asm.stack(steps)
    np.testing.assert_allclose(f, f2, atol=2e-6)   # f64-vs-f32 mean accum
    np.testing.assert_allclose(l, l2, atol=1e-6)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_array_equal(m, m2)

    # truncation: 3 records of 4 boxes + global = 13 rows -> capped at 5
    assert m[2 * 5:3 * 5].sum() == 5
    # empty padding steps keep the step index in column 11
    assert (l[3 * 5:, 11] == 3).all() and (l[3 * 5:, :11] == 0).all()

    # missing keys raise like the python path
    with pytest.raises(KeyError):
        reader.pack_path([("nope/0000",)], 4, 5)

    # paths spanning shards fall back to python (None)
    two = YTbFeaturesReader([ytb_env["store_path"],
                             ytb_env["store_path"] + ""])  # same file twice
    assert len(two._stores) == 2
    # all keys resolve to the last shard that has them -> single store,
    # still packs; force a cross-shard case artificially
    two._by_key[keys[0]] = 0
    two._by_key[keys[2]] = 1
    assert two.pack_path([(keys[0],), (keys[2],)], 4, 5) is None
    reader.close()
    two.close()


@pytest.mark.parametrize("max_boxes", [5, 9])
def test_native_pack_pano_path_matches_python(tmp_path, max_boxes):
    """The pano variant of the C++ packer (heading/elevation trig in the
    location columns) must match reader[(key, h, nh)] + pad_step + stack.
    max_boxes=5 fills every block (4 regions + the global row);
    max_boxes=9 leaves a padding tail, exercising the tail-only zeroing
    path (the packer no longer pre-zeroes rows it is about to write)."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.datasets import _PathFeatureAssembler
    from youtube_vln_tpu.data.features_reader import PanoFeaturesReader

    paths = F.build_r2r_fixture(tmp_path)
    reader = PanoFeaturesReader(paths["store_path"])
    keys = sorted(reader.keys)[:3]
    headings = [0.3, -1.2, 2.5]
    next_h = [-1.2, 2.5, 2.5]
    packed = reader.pack_pano_path(keys, headings, next_h, max_steps=4,
                                   max_boxes=max_boxes)
    if packed is None:
        pytest.skip("native library not built")
    f, l, p, m = packed
    asm = _PathFeatureAssembler(4, max_boxes)
    steps = [asm.pad_step(*reader[(k, h, nh)], i)
             for i, (k, h, nh) in enumerate(zip(keys, headings, next_h))]
    f2, l2, p2, m2 = asm.stack(steps)
    np.testing.assert_allclose(f, f2, atol=2e-6)
    np.testing.assert_allclose(l, l2, atol=2e-6)
    np.testing.assert_array_equal(p, p2)
    np.testing.assert_array_equal(m, m2)
    reader.close()


@pytest.mark.parametrize("max_boxes", [5, 9])
def test_native_pack_pano_steps_matches_per_block(tmp_path, max_boxes):
    """The batched f16 STEP packer (one C call for n independent
    (key, heading, next_heading, position) blocks — the beam-eval host
    path) must bit-match the PYTHON per-block route: pad_step + position
    + astype(float16); an empty key must bit-match empty_step.
    max_boxes=9 leaves a padding tail (fixture records have 4 regions +
    the global row), exercising the tail-only zeroing path against an
    oracle that does not share it."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.datasets import _PathFeatureAssembler
    from youtube_vln_tpu.data.features_reader import PanoFeaturesReader

    paths = F.build_r2r_fixture(tmp_path)
    reader = PanoFeaturesReader(paths["store_path"])
    ks = sorted(reader.keys)
    # mixed real/empty blocks, repeated key at a different position
    keys = [ks[0], ks[1], None, ks[0], None]
    hs = [0.3, -1.2, 0.0, 2.5, 0.0]
    nhs = [-1.2, 2.5, 0.0, 0.3, 0.0]
    poss = [0, 2, 1, 3, 0]
    out = reader.pack_pano_steps(keys, hs, nhs, poss, max_boxes=max_boxes)
    if out is None:
        pytest.skip("native library not built")
    f, l, m = out
    f = f.reshape(5, max_boxes, 2048)
    l = l.reshape(5, max_boxes, 12)
    m = m.reshape(5, max_boxes)
    asm = _PathFeatureAssembler(4, max_boxes)
    for j, (k, h, nh, pos) in enumerate(zip(keys, hs, nhs, poss)):
        if k is None:
            rf, rl, _, rm = asm.empty_step(pos)
            nf, nl, nm = rf.astype(np.float16), rl, rm
        else:
            # python oracle: f16-appropriate tolerance (the C f64-mean
            # global row differs from numpy's pairwise mean by <=1 f32
            # ulp, which can flip an f16 bit)
            rf, rl, _, rm = asm.pad_step(*reader[(k, h, nh)], pos)
            # native per-block route: the dense item's path — BIT-exact
            # (this is the dedup==dense transport contract)
            nf32, nl, _, nm = reader.pack_pano_path([k], [h], [nh], 1,
                                                    max_boxes)
            nl[:, 11] = pos
            nf = nf32.astype(np.float16)
        np.testing.assert_allclose(f[j].astype(np.float32), rf, atol=2e-3)
        np.testing.assert_allclose(l[j], rl, atol=2e-6)
        np.testing.assert_array_equal(m[j], rm)
        np.testing.assert_array_equal(f[j], nf)
        np.testing.assert_array_equal(l[j], nl)
        np.testing.assert_array_equal(m[j], nm)
        # the padding tail must be exactly zero (tail-only memset path)
        rows = int(rm.sum())
        assert not f[j, rows:].any() and not m[j, rows:].any()
        np.testing.assert_array_equal(l[j, rows:, :11], 0.0)
    reader.close()


def test_native_pack_pano_steps_rejects_undersized_out(tmp_path):
    """The batched packer writes n_blocks*max_boxes rows through raw
    pointers — an undersized caller-provided ``out`` must raise (a real
    if/raise, alive under ``python -O``), never reach C (heap
    corruption)."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.features_reader import PanoFeaturesReader

    paths = F.build_r2r_fixture(tmp_path)
    reader = PanoFeaturesReader(paths["store_path"])
    ks = sorted(reader.keys)[:2]
    if reader.pack_pano_steps(ks, [0.0, 0.1], [0.1, 0.2], [0, 1],
                              max_boxes=5) is None:
        reader.close()
        pytest.skip("native library not built")
    short = (np.zeros((1, 5, 2048), np.float16),   # 1 block < 2 blocks
             np.zeros((2, 5, 12), np.float32),
             np.zeros((2, 5), np.int32))
    with pytest.raises(ValueError, match="undersized"):
        reader.pack_pano_steps(ks, [0.0, 0.1], [0.1, 0.2], [0, 1],
                               max_boxes=5, out=short)
    reader.close()


@pytest.mark.parametrize("dedup", [False, True], ids=["dense", "dedup"])
def test_eval_fast_item_matches_generic_path(r2r_env, dedup):
    """The probs-free batched eval item (one native call, no [S_v,1601]
    stack) must equal the generic _finalize item field-for-field —
    features bit-exactly (F16C == numpy astype(float16)).  Parametrized
    over BOTH transport layouts: the r5 default flip to dedup_beam_steps
    would otherwise silently drop the dense fast-path pin (the dense
    layout stays reachable via --no_dedup_beam_steps and is the A/B
    baseline in bench_serving)."""
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    mk = lambda: BeamDataset(
        _beam_args(dedup_beam_steps=dedup),
        f"{r2r_env['data_dir']}/task/R2R_val_unseen.json",
        f"{r2r_env['data_dir']}/beamsearch/beams_val_unseen.json",
        tok, reader, num_beams=4, num_beams_strict=False,
        training=False, masked_vision=False, masked_language=False,
        shuffle_visual_features=False, data_dir=r2r_env["data_dir"], seed=0)
    ds_fast = mk()
    if ds_fast._packed_paths_f16("scan0", [["scan0_vp0"]], 0.0) is None:
        pytest.skip("native library not built")
    ds_ref = mk()
    ds_ref.reader = _NoBatchReader(reader)
    for i in (0, 1):
        a, b = ds_fast[i], ds_ref[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            assert np.asarray(a[k]).dtype == np.asarray(b[k]).dtype, k
    reader.close()


class _NoBatchReader:
    """Proxy hiding pack_pano_steps so BeamDataset takes the generic
    per-candidate assembly path."""

    def __init__(self, reader):
        self._r = reader

    def __getattr__(self, name):
        if name == "pack_pano_steps":
            raise AttributeError(name)
        return getattr(self._r, name)

    def __getitem__(self, q):
        return self._r[q]


def test_loader_shm_overflow_falls_back_loudly(caplog):
    """Items bigger than the shared-memory slab must arrive intact via
    the pickle fallback, with a warning + counter.  The slab is sized
    from probes at {0, n//3, 2n//3, n-1} (loader.py), so the oversized
    items here sit at UNPROBED indices 1 and 3 — adversarial inputs can
    always dodge a finite probe set, and this pins the cliff behavior."""
    import logging

    big = {1, 3}

    class GrowingDataset:
        def __len__(self):
            return 7        # probe indices: {0, 2, 4, 6}

        def num_candidates(self):
            return 1

        def __getitem__(self, i):
            n = 100000 if i in big else 8
            return dict(
                ranking_target=np.asarray(0, np.int32),
                instr_tokens=np.full((1, n), i, np.int32),
                instr_mask=np.ones((1, n), np.int32),
                instr_targets=np.full((1, n), -1, np.int32),
                segment_ids=np.zeros((1, n), np.int32),
                opt_mask=np.ones(1, bool),
            )

    loader = Loader(GrowingDataset(), batch_size=1, shuffle=False,
                    num_workers=1, use_shared_memory=True)
    with caplog.at_level(logging.WARNING,
                         logger="youtube_vln_tpu.data.loader"):
        batches = list(loader)
    assert len(batches) == 7
    assert loader.shm_fallbacks_by_reason.get("slab_overflow", 0) == 2
    assert any("slab_overflow" in r.message for r in caplog.records)
    # fallback items arrived intact
    assert batches[1]["instr_tokens"].shape == (1, 1, 100000)
    assert int(batches[3]["instr_tokens"][0, 0, 0]) == 3


def test_loader_slab_probe_cached_across_epochs():
    """The slab-sizing probes assemble full items in the PARENT process;
    they must run once per Loader, not once per epoch (item geometry is
    epoch-independent), or every epoch start stalls for ~4 item times."""

    class CountingDataset:
        def __init__(self):
            self.parent_calls = 0

        def __len__(self):
            return 8

        def num_candidates(self):
            return 1

        def __getitem__(self, i):
            self.parent_calls += 1   # fork-isolated: workers don't add here
            return dict(ranking_target=np.asarray(0, np.int32),
                        instr_tokens=np.full((1, 4), i, np.int32),
                        opt_mask=np.ones(1, bool))

    ds = CountingDataset()
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2,
                    use_shared_memory=True)
    assert len(list(loader)) == 4
    probed = ds.parent_calls
    assert probed == 4          # probes at {0, 2, 5, 7}, parent-side only
    loader.set_epoch(1)
    assert len(list(loader)) == 4
    assert ds.parent_calls == probed   # no re-probe on the next epoch


def test_beam_eval_batch_size_one_scores_all_ranked_paths(tmp_path):
    """batch_size==1 skips the reference's per-item tile/trim
    (all_dataset.py:782), so eval items keep ALL ranked paths even when
    there are more than num_beams; the static collate must size to the
    dataset-wide max and mask the shorter items' padding via opt_mask.
    Regression: num_candidates() used to return num_beams here, making
    collate crash with 'could not broadcast' on the first oversized item."""
    import json

    from youtube_vln_tpu.data.tokenizer import load_tokenizer

    env = F.build_r2r_fixture(tmp_path, n_beams=6)
    beam_path = f"{env['data_dir']}/beamsearch/beams_val_unseen.json"
    with open(beam_path) as fh:
        beams = json.load(fh)
    # one item gets an EXTRA ranked path so item candidate counts differ
    beams[0]["ranked_paths"].append(beams[0]["ranked_paths"][0])
    with open(beam_path, "w") as fh:
        json.dump(beams, fh)

    tok = load_tokenizer(env["vocab_path"])
    reader = PanoFeaturesReader(env["store_path"])
    # dense transport: this test pins the DENSE ragged-candidate collate
    # sizing (the step-dedup layout's ragged handling is pinned by the
    # bucket/expansion tests above)
    args = _beam_args(batch_size=1, num_beams=4, dedup_beam_steps=False)
    ds = BeamDataset(
        args, f"{env['data_dir']}/task/R2R_val_unseen.json", beam_path,
        tok, reader, num_beams=args.num_beams, num_beams_strict=False,
        training=False, masked_vision=False, masked_language=False,
        shuffle_visual_features=False, data_dir=env["data_dir"], seed=0)
    assert ds.batch_size == 1
    assert ds.num_candidates() == 7    # dataset max, not num_beams
    assert ds[0]["ranking_target"].shape[0] == 7
    assert ds[1]["ranking_target"].shape[0] == 6

    loader = Loader(ds, batch_size=1, shuffle=False, drop_last=False)
    batches = list(loader)
    assert batches[0]["image_features"].shape[:2] == (1, 7)
    assert int(batches[0]["opt_mask"].sum()) == 7
    assert batches[1]["image_features"].shape[:2] == (1, 7)
    assert int(batches[1]["opt_mask"].sum()) == 6   # pad row masked
    reader.close()


def test_engine_subset_delegates_dataset_hooks():
    """--mini/--debug wrap datasets in Subset; the loader's optional hooks
    (reseed for per-item determinism, num_candidates for collate sizing)
    must pass through — a Subset that swallowed reseed would make forked
    pool workers replay their fork-time RNG state."""
    from youtube_vln_tpu.training.engine import Subset

    class DS:
        def __init__(self):
            self.seeded = []

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return i

        def reseed(self, s):
            self.seeded.append(s)

        def num_candidates(self):
            return 3

    inner = DS()
    sub = Subset(inner, [2, 3])
    assert hasattr(sub, "reseed")          # loader.py gates on this
    sub.reseed(7)
    assert inner.seeded == [7]
    assert sub.num_candidates() == 3
    assert len(sub) == 2 and sub[0] == 2

    class Bare:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return i

    bare = Subset(Bare(), [0])
    assert not hasattr(bare, "reseed")     # mirrors the wrapped dataset
    assert getattr(bare, "num_unique_candidates", lambda: None)() is None


def test_io_dtype_halves_feature_bytes(ytb_env):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    assert args.io_dtype == "float16"
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    s = ds[0]
    assert s["image_features"].dtype == np.float16
    assert s["image_targets"].dtype == np.float16
    reader.close()


def test_bnb_dataset_train_sample(tmp_path):
    from youtube_vln_tpu.data.datasets import BnBDataset
    from youtube_vln_tpu.data.features_reader import BnBFeaturesReader
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    paths = F.build_bnb_fixture(tmp_path / "bnb")
    tok = load_tokenizer(paths["vocab_path"])
    reader = BnBFeaturesReader(paths["store_path"])
    args = RunConfig(
        pretrain=True, pre_dataset="bnb", ranking=True, masked_vision=True,
        masked_language=True, max_instruction_length=32, max_path_length=4,
        max_num_boxes=5, min_path_length=3, min_captioned=2, max_captioned=4,
        num_negatives=2, shuffler="different", negative_style="normal",
        sparse_vision_targets=False,  # this test pins the dense layout
        skeleton_path="")  # '' -> ConcatenateInstructionGenerator
    ds = BnBDataset(args=args, caption_path=paths["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    assert len(ds) > 0 and ds.num_candidates() == 7
    s = ds[0]
    assert s["image_features"].shape == (7, 20, 2048)
    assert s["instr_tokens"].shape == (7, 32)
    # concatenated instruction starts with CLS
    cls = tok.vocab["[CLS]"]
    targets = s["instr_targets"]
    raw_or_masked_first = s["instr_tokens"][:, 0]
    assert all(t == cls or tgt == cls
               for t, tgt in zip(raw_or_masked_first, targets[:, 0]))
    reader.close()


def test_bnb_out_listing(tmp_path):
    from youtube_vln_tpu.data.datasets import BnBDataset
    from youtube_vln_tpu.data.features_reader import BnBFeaturesReader
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    paths = F.build_bnb_fixture(tmp_path / "bnb2")
    tok = load_tokenizer(paths["vocab_path"])
    reader = BnBFeaturesReader(paths["store_path"])
    args = RunConfig(
        pretrain=True, pre_dataset="bnb", ranking=True,
        max_instruction_length=32, max_path_length=4, max_num_boxes=5,
        min_path_length=3, min_captioned=2, max_captioned=4,
        num_negatives=2, out_listing=True, skeleton_path="")
    ds = BnBDataset(args=args, caption_path=paths["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=False, masked_language=False, training=True,
                    seed=0)
    s = ds[0]
    # out-listing drops the random-replacement negatives
    # (reference all_dataset.py:548-549): 1 + 2 + 2 candidates are real
    assert s["opt_mask"].sum() == 5
    reader.close()


def test_beam_dataset_aug_positive_field(r2r_env, tmp_path):
    """The speaker-augmented ``positive`` field is INERT in the reference
    beyond its GT-incompatibility assert: its branch (all_dataset.py:
    702-706) is unconditionally overwritten by the success-count if/else
    that follows (:709-733), so an aug item with positive=false selects
    beams and draws from the np RNG exactly like the same item without
    the field.  Pinned item-for-item against a control dataset (r5 review
    found our earlier `elif` kept the dead branch alive, changing 30RSA
    training data and the RNG stream)."""
    import json as _json
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    data_dir = r2r_env["data_dir"]
    items = _json.load(open(f"{data_dir}/task/R2R_train.json"))
    for item in items:
        item["positive"] = [False] * 3
    aug_dir = tmp_path / "task"
    aug_dir.mkdir()
    _json.dump(items, open(aug_dir / "aug+R2R_train.json", "w"))
    import shutil
    (tmp_path / "beamsearch").mkdir()
    shutil.copy(f"{data_dir}/beamsearch/beams_train.json",
                tmp_path / "beamsearch" / "aug_beams_train.json")

    tok = load_tokenizer(r2r_env["vocab_path"])
    reader = PanoFeaturesReader(r2r_env["store_path"])
    args = _beam_args()

    def mk(task_json, beam_json):
        return BeamDataset(
            args, task_json, beam_json, tok, reader,
            num_beams=args.num_beams_train, num_beams_strict=False,
            training=True, masked_vision=False, masked_language=False,
            shuffle_visual_features=False, data_dir=data_dir, seed=0)

    ds_aug = mk(str(aug_dir / "aug+R2R_train.json"),
                str(tmp_path / "beamsearch" / "aug_beams_train.json"))
    ds_plain = mk(f"{data_dir}/task/R2R_train.json",
                  f"{data_dir}/beamsearch/beams_train.json")
    assert len(ds_aug) == len(ds_plain)
    saw_target_zero = False
    for i in range(len(ds_aug)):
        a, b = ds_aug[i], ds_plain[i]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"item {i} {k}")
        saw_target_zero |= int(a["ranking_target"]) == 0
    # the fixture has items with sufficient success counts, so the dead
    # branch's -1 would have shown here if it were live
    assert saw_target_zero
    reader.close()


def test_sparse_vision_targets_end_to_end(ytb_env):
    """Sparse transport through dataset -> loader -> train step."""
    import jax
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.parallel import train_step as ts

    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"],
                     sparse_vision_targets=True, dedup_candidates=False,
                     traj_judge=True, learning_rate=1e-3)
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    s = ds[0]
    assert "image_targets_idx" in s
    m_cap = s["image_targets_idx"].shape[-1]
    assert s["image_targets"].shape == (7, m_cap, 1601)

    loader = Loader(ds, batch_size=2, shuffle=True, seed=1)
    batch = next(iter(loader))
    assert batch["image_targets_idx"].shape[:2] == (2, 7)

    cfg = tiny_config(vocab_size=256, v_feature_size=2048, v_target_size=1601,
                      ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    state, tx, _ = ts.create_train_state(params, args, 4)
    step = jax.jit(ts.build_train_step(cfg, args, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/vision"]))
    assert float(metrics["loss/vision"]) > 0
    reader.close()


def test_tokenize_highlight_perturbation_parity(tmp_path):
    """Our tokenize_dataset equals the reference tokenize() on the optional
    highlight/perturbation fields (reference common.py:114-192; inert in
    every published recipe but part of the tokenize surface)."""
    import copy
    import sys
    import types

    from conftest import REFERENCE_ROOT, import_reference_vilbert
    import fake_lmdb

    # transformers -> huggingface_hub needs requests.exceptions, which the
    # bare stub installed by import_reference_vilbert lacks.  A prior
    # reference-importing test may have ALREADY installed the stub, so
    # evict it and load the real package (order-independent).
    stub = sys.modules.get("requests")
    if stub is not None and getattr(getattr(stub, "__spec__", None),
                                    "loader", None) is None:
        del sys.modules["requests"]
    import requests  # noqa: F401

    import_reference_vilbert()
    fake_lmdb.install()
    sys.modules.setdefault("pyfiglet", types.ModuleType("pyfiglet"))
    sys.modules["pyfiglet"].figlet_format = lambda *a, **k: ""
    if "argtyped" not in sys.modules:
        argtyped = types.ModuleType("argtyped")

        class Arguments:
            def __init_subclass__(cls, **kw):
                pass

        argtyped.Arguments = Arguments
        sys.modules["argtyped"] = argtyped
    from utils.dataset.common import tokenize as ref_tokenize

    tok = F.write_fixture_vocab(tmp_path / "vocab.txt")
    items = [{
        "instructions": ["walk into the kitchen and stop",
                         "go past the table"],
        "highlights": [["kitchen", "stop", "zzzqqq"], ["table"]],
        "perturbations": [["walk into the table and stop"],
                          ["go past the kitchen"]],
        "perturbation_highlights": [[["table", "walk"]], [["kitchen"]]],
    }, {
        # no optional fields: only instruction_tokens must appear
        "instructions": ["turn left"],
    }]
    max_len = 12

    ours = copy.deepcopy(items)
    I.tokenize_dataset(ours, tok, max_len)
    theirs = copy.deepcopy(items)
    ref_tokenize(theirs, tok, max_len)

    assert ours == theirs
    assert "instruction_highlights" not in ours[1]
    # masks align with the framed token rows
    row = ours[0]["instruction_tokens"][0]
    hl = ours[0]["instruction_highlights"][0]
    assert len(hl) == max_len and any(hl)
    assert hl[row.index(tok.vocab["kitchen"])]


# --------------------------------------------------------------------------- #
# candidate-dedup transport (--dedup_candidates)
# --------------------------------------------------------------------------- #
def _dedup_pair(ytb_env, seed=123):
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    mk = lambda **kw: YTbDataset(
        args=_ytb_args(skeleton_path=ytb_env["skeleton_path"],
                       sparse_vision_targets=True, **kw),
        caption_path=ytb_env["caption_path"], tokenizer=tok,
        features_reader=reader, masked_vision=True, masked_language=True,
        training=True, seed=0)
    # dedup=None would FOLLOW sparse (r4 default-on); pin the pair
    ds_dense, ds_dedup = mk(dedup_candidates=False), mk(dedup_candidates=True)
    ds_dense.reseed(seed)
    dense = ds_dense[0]
    ds_dedup.reseed(seed)
    dedup = ds_dedup[0]
    return dense, dedup, reader


def test_dedup_item_expands_to_dense(ytb_env):
    """The dedup item, host-expanded, must equal the dense item BIT-EXACTLY
    (randomize_regions_sparse_dedup_np draws in the dense path's order)."""
    dense, dedup, reader = _dedup_pair(ytb_env)
    # ranking mode: positive + 2 caption-negs share visuals -> 5 unique
    assert dedup["uniq_image_features"].shape[0] == 5
    np.testing.assert_array_equal(dedup["cand_index"],
                                  [0, 0, 0, 1, 2, 3, 4])

    cm = dedup["cand_index"]
    expanded = dedup["uniq_image_features"][cm].copy()
    expanded[dedup["feature_zero_mask"].astype(bool)] = 0
    np.testing.assert_array_equal(expanded, dense["image_features"])
    np.testing.assert_array_equal(dedup["uniq_image_locations"][cm],
                                  dense["image_locations"])
    np.testing.assert_array_equal(dedup["uniq_image_mask"][cm],
                                  dense["image_mask"])
    for k in ("image_targets", "image_targets_idx", "image_targets_mask",
              "instr_tokens", "instr_targets", "instr_mask", "opt_mask"):
        np.testing.assert_array_equal(dedup[k], dense[k], err_msg=k)
    reader.close()


def test_dedup_train_step_matches_dense(ytb_env):
    """Same losses through the jitted step whether the batch arrives dense
    or dedup+in-graph-expanded (loss-exactness of the transport)."""
    import jax
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.parallel import train_step as ts

    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    mk = lambda **kw: YTbDataset(
        args=_ytb_args(skeleton_path=ytb_env["skeleton_path"],
                       sparse_vision_targets=True, traj_judge=True,
                       learning_rate=1e-3, **kw),
        caption_path=ytb_env["caption_path"], tokenizer=tok,
        features_reader=reader, masked_vision=True, masked_language=True,
        training=True, seed=0)
    batches = {}
    for name, ds in (("dense", mk(dedup_candidates=False)),
                     ("dedup", mk(dedup_candidates=True))):
        loader = Loader(ds, batch_size=2, shuffle=True, seed=1)
        batches[name] = next(iter(loader))
    assert batches["dedup"]["uniq_image_features"].shape[1] == 5
    assert "image_features" not in batches["dedup"]

    cfg = tiny_config(vocab_size=256, v_feature_size=2048,
                      v_target_size=1601, ranking=True, traj_judge=True,
                      masked_vision=True, masked_language=True)
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"],
                     sparse_vision_targets=True, traj_judge=True,
                     learning_rate=1e-3)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    state, tx, _ = ts.create_train_state(params, args, 4)
    step = jax.jit(ts.build_train_step(cfg, args, tx))
    metrics = {}
    for name, batch in batches.items():
        _, metrics[name] = step(state, batch, jax.random.PRNGKey(7))
    for k in metrics["dense"]:
        np.testing.assert_allclose(float(metrics["dedup"][k]),
                                   float(metrics["dense"][k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    reader.close()


def test_dedup_requires_sparse_targets():
    # explicitly forcing dedup on without sparse targets is an error;
    # (the r4 defaults are sparse=True with dedup following it, so the
    # conflict now only arises from an explicit --dedup_candidates
    # --no_sparse_vision_targets combination)
    with pytest.raises(ValueError, match="sparse_vision_targets"):
        _ytb_args(dedup_candidates=True,
                  sparse_vision_targets=False).validate()


def test_dedup_follows_sparse_default():
    """r4 defaults: the measured-faster transport pair is ON out of the
    box, and --no_sparse_vision_targets alone downgrades dedup with it."""
    cfg = RunConfig(ranking=True)
    assert cfg.sparse_vision_targets and cfg.dedup_candidates
    off = RunConfig(ranking=True, sparse_vision_targets=False)
    assert off.dedup_candidates is False


def test_native_pack_f16_and_gather_probs(ytb_env):
    """vlnstore_pack_path_f16 must equal pack_path's features cast to f16
    (bit-exact: F16C round-to-nearest-even == numpy astype) with identical
    locations/mask; vlnstore_gather_probs must reproduce pack_path's probs
    rows for arbitrary region ids incl. the uniform global row, padded
    steps and the id sentinel."""
    reader = YTbFeaturesReader(ytb_env["store_path"])
    keys = sorted(reader.keys)
    step_keys = [(keys[0], keys[1]), (keys[2],),
                 (keys[3], keys[4], keys[5])]
    max_steps, max_boxes = 4, 5
    dense = reader.pack_path(step_keys, max_steps, max_boxes)
    if dense is None:
        pytest.skip("native library not built")
    f32, l32, p32, m32 = dense

    packed = reader.pack_path_f16(step_keys, max_steps, max_boxes)
    assert packed is not None
    f16, l16, m16 = packed
    assert f16.dtype == np.float16
    np.testing.assert_array_equal(f16, f32.astype(np.float16))
    np.testing.assert_array_equal(l16, l32)
    np.testing.assert_array_equal(m16, m32)

    s_total = max_steps * max_boxes
    ids = np.asarray([0,              # global region -> uniform row
                      1, 4,           # real + truncated-range rows
                      5,              # second step's global row
                      3 * max_boxes,  # padded step -> zeros
                      s_total,        # sentinel (padding) -> zeros
                      ], np.int32)
    rows = reader.gather_probs(step_keys, ids, max_boxes)
    assert rows is not None
    for j, rid in enumerate(ids):
        if rid < s_total:
            np.testing.assert_array_equal(rows[j], p32[rid], err_msg=str(rid))
        else:
            assert (rows[j] == 0).all()
    reader.close()


def test_loader_worker_determinism_dedup(ytb_env):
    """The dedup transport (f16 uniq rows + uint8 zero-mask + gather
    index) must survive the fork-pool shared-memory path unchanged and
    stay worker-count deterministic."""
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"],
                     sparse_vision_targets=True, dedup_candidates=True)
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=True, masked_language=True, training=True,
                    seed=0)
    batches = {}
    for nw in (0, 2):
        loader = Loader(ds, batch_size=2, shuffle=True, seed=3,
                        num_workers=nw)
        batches[nw] = list(loader)
    assert len(batches[0]) == len(batches[2]) > 0
    assert "uniq_image_features" in batches[0][0]
    assert batches[0][0]["uniq_image_features"].dtype == np.float16
    assert batches[0][0]["feature_zero_mask"].dtype == np.uint8
    for b0, b2 in zip(batches[0], batches[2]):
        assert set(b0) == set(b2)
        for k in b0:
            np.testing.assert_array_equal(b0[k], b2[k], err_msg=k)
    reader.close()


def test_vision_targets_skipped_when_task_off(ytb_env):
    """When the masked-vision TASK is globally off no loss reads vision
    targets, so items must not build/ship them (a ranking-only eval
    batch is mostly the dense uniform [nc, S, 1601] block otherwise).
    A masking-off SPLIT under an enabled task still emits them — the
    reference's test_epoch computes the vision loss on unmasked uniform
    targets (utils_init.py:122-128)."""
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])

    # ranking-only: task off everywhere -> no target keys
    args = _ytb_args(skeleton_path=ytb_env["skeleton_path"],
                     masked_vision=False, masked_language=False)
    ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                    tokenizer=tok, features_reader=reader,
                    masked_vision=False, masked_language=False,
                    training=True, seed=0)
    item = ds[0]
    assert "image_targets" not in item
    assert "image_targets_mask" not in item

    # eval split with masking off, TASK on -> uniform targets kept
    args_on = _ytb_args(skeleton_path=ytb_env["skeleton_path"])
    assert args_on.masked_vision
    ds_on = YTbDataset(args=args_on, caption_path=ytb_env["caption_path"],
                       tokenizer=tok, features_reader=reader,
                       masked_vision=False, masked_language=False,
                       training=True, seed=0)
    item = ds_on[0]
    assert "image_targets" in item
    np.testing.assert_allclose(np.asarray(item["image_targets"],
                                          np.float32)[0, 0],
                               1.0 / 1601, rtol=1e-3)

    # the jitted step runs without the keys (ranking loss only)
    import jax
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.parallel import train_step as ts
    batch = next(iter(Loader(ds, batch_size=2, shuffle=True, seed=1)))
    assert "image_targets" not in batch
    cfg = tiny_config(vocab_size=256, v_feature_size=2048,
                      v_target_size=1601, ranking=True)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    state, tx, _ = ts.create_train_state(params, args, 4)
    step = jax.jit(ts.build_train_step(cfg, args, tx))
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss/train"]))
    assert "loss/vision" not in metrics
    reader.close()


def test_native_packers_fuzz_matches_python(tmp_path):
    """Randomized-geometry fuzz of the C packers vs the Python assembly:
    random per-record box counts (incl. k=1 and truncation), random
    max_steps/max_boxes, random step groupings, random headings — C and
    Python must agree bit-for-bit (probs/mask/f16) / to f64-vs-f32 mean
    accumulation (features) on every draw.  The fixed-case pins above
    cover the contracts; this covers the geometry space between them."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.datasets import _PathFeatureAssembler
    from youtube_vln_tpu.data.store import StoreWriter

    if get_native() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(99)

    # region store with varying box counts
    rpath = tmp_path / "fr.vlnstore"
    with StoreWriter(rpath) as w:
        for i in range(10):
            w.add(f"v/{i:04d}",
                  F._random_record(rng, int(rng.integers(1, 7)), False))
    rreader = YTbFeaturesReader(rpath)
    rkeys = sorted(rreader.keys)

    for trial in range(10):
        max_steps = int(rng.integers(1, 5))
        max_boxes = int(rng.integers(2, 9))
        n_steps = int(rng.integers(1, max_steps + 1))
        step_keys = [tuple(rng.choice(rkeys,
                                      size=int(rng.integers(1, 4)),
                                      replace=False))
                     for _ in range(n_steps)]
        packed = rreader.pack_path(step_keys, max_steps, max_boxes)
        assert packed is not None
        f, l, p, m = packed
        asm = _PathFeatureAssembler(max_steps, max_boxes)
        steps = [asm.pad_step(*rreader[k], i)
                 for i, k in enumerate(step_keys)]
        steps += [asm.empty_step(i) for i in range(n_steps, max_steps)]
        f2, l2, p2, m2 = asm.stack(steps)
        np.testing.assert_allclose(f, f2, atol=2e-6, err_msg=str(trial))
        np.testing.assert_allclose(l, l2, atol=1e-6)
        np.testing.assert_array_equal(p, p2)
        np.testing.assert_array_equal(m, m2)
        # f16 variant bit-matches astype of the NATIVE f32 pack (the
        # global-region mean row can differ from the python pack by one
        # f32 ulp: C f64 accumulation vs numpy pairwise summation)
        f16 = rreader.pack_path_f16(step_keys, max_steps, max_boxes)
        assert f16 is not None
        np.testing.assert_array_equal(f16[0], f.astype(np.float16))
        # probs gather on random region ids (incl. out-of-range rows)
        ids = rng.integers(-1, max_steps * max_boxes + 3, size=7,
                           dtype=np.int32)
        ids.sort()
        pr = rreader.gather_probs(step_keys, ids, max_boxes)
        assert pr is not None
        for j, rid in enumerate(ids):
            want = (p2[rid] if 0 <= rid < max_steps * max_boxes
                    else np.zeros(p2.shape[1], np.float32))
            np.testing.assert_array_equal(pr[j], want, err_msg=str(rid))
    rreader.close()

    # pano store with varying box counts
    ppath = tmp_path / "fp.vlnstore"
    with StoreWriter(ppath) as w:
        for i in range(8):
            w.add(f"s-v{i}",
                  F._random_record(rng, int(rng.integers(1, 7)), True))
    preader = PanoFeaturesReader(ppath)
    pkeys = sorted(preader.keys)

    for trial in range(10):
        max_steps = int(rng.integers(1, 5))
        max_boxes = int(rng.integers(2, 9))
        n_steps = int(rng.integers(1, max_steps + 1))
        keys = list(rng.choice(pkeys, size=n_steps, replace=True))
        hs = list(rng.uniform(-np.pi, np.pi, n_steps))
        nhs = list(rng.uniform(-np.pi, np.pi, n_steps))
        packed = preader.pack_pano_path(keys, hs, nhs, max_steps, max_boxes)
        assert packed is not None
        f, l, p, m = packed
        asm = _PathFeatureAssembler(max_steps, max_boxes)
        steps = [asm.pad_step(*preader[(k, h, nh)], i)
                 for i, (k, h, nh) in enumerate(zip(keys, hs, nhs))]
        steps += [asm.empty_step(i) for i in range(n_steps, max_steps)]
        f2, l2, p2, m2 = asm.stack(steps)
        np.testing.assert_allclose(f, f2, atol=2e-6, err_msg=str(trial))
        np.testing.assert_allclose(l, l2, atol=1e-6)
        np.testing.assert_array_equal(p, p2)
        np.testing.assert_array_equal(m, m2)
        # batched f16 single-step packer: blocks in random order with
        # empty slots interleaved
        slots = [(k, h, nh, i) for i, (k, h, nh)
                 in enumerate(zip(keys, hs, nhs))]
        slots.append((None, 0.0, 0.0, max_steps - 1))   # empty block
        bf = preader.pack_pano_steps(
            [s[0] for s in slots], [s[1] for s in slots],
            [s[2] for s in slots], [s[3] for s in slots], max_boxes)
        assert bf is not None
        for j, (k, h, nh, pos) in enumerate(slots):
            blk = (asm.empty_step(pos) if k is None
                   else asm.pad_step(*preader[(k, h, nh)], pos))
            got_f = bf[0][j * max_boxes:(j + 1) * max_boxes]
            want_f = blk[0].astype(np.float16)
            # row 0 is the f64-vs-f32 mean accumulation (<=1 f16 ulp);
            # every other row is a raw store row -> bit-exact
            np.testing.assert_array_equal(got_f[1:], want_f[1:])
            np.testing.assert_allclose(
                got_f[0].astype(np.float32), want_f[0].astype(np.float32),
                atol=2e-3)
            np.testing.assert_allclose(
                bf[1][j * max_boxes:(j + 1) * max_boxes], blk[1], atol=1e-6)
            np.testing.assert_array_equal(
                bf[2][j * max_boxes:(j + 1) * max_boxes], blk[3])
    preader.close()


def test_ytb_judge_only_pretrain_item_collates(ytb_env):
    """Judge-only pretraining (--traj_judge without --ranking) assembles
    1 + 3n candidates — positive + ALL THREE negative families, each with
    its own visual features (reference all_dataset.py:189-197; the
    negative_style block at common.py:509 is OUTSIDE the traj_judge
    branch).  num_candidates() used to claim 1 + 2n, so collate rejected
    every judge-only item (r5 review finding).  max_captioned < path
    length guarantees the captionless frames the judge negatives
    permute."""
    from youtube_vln_tpu.data.loader import collate
    from youtube_vln_tpu.data.tokenizer import load_tokenizer
    tok = load_tokenizer(ytb_env["vocab_path"])
    reader = YTbFeaturesReader(ytb_env["store_path"])
    for dedup in (False, True):
        args = _ytb_args(ranking=False, traj_judge=True, masked_vision=False,
                         masked_language=False, max_captioned=2,
                         dedup_candidates=dedup,
                         sparse_vision_targets=dedup,
                         skeleton_path=ytb_env["skeleton_path"])
        ds = YTbDataset(args=args, caption_path=ytb_env["caption_path"],
                        tokenizer=tok, features_reader=reader,
                        masked_vision=False, masked_language=False,
                        training=True, seed=0)
        assert ds.num_candidates() == 7
        assert ds.num_unique_candidates() == (7 if dedup else None)
        item = ds[0]
        assert item["instr_tokens"].shape == (7, 32)
        batch = collate([ds[0], ds[1]], ds.num_candidates(),
                        ds.num_unique_candidates())
        assert batch["instr_tokens"].shape == (2, 7, 32)
        key = "uniq_image_features" if dedup else "image_features"
        assert batch[key].shape[1] == 7
    reader.close()


def test_judge_negatives_all_captioned_positive_raises():
    """A fully-captioned positive makes the judge negative loops
    unsatisfiable — the reference while/continue hangs the dataloader
    forever (common.py:435-461); we raise loudly instead (documented
    safe-superset, MIGRATION.md)."""
    import random as _random
    positive = [("v", (1,)), ("v", (2,)), ("v", (3,))]
    with pytest.raises(ValueError, match="CAPTIONLESS"):
        S.generate_negatives(positive, [True, True, True], ["v"],
                             {"v": []}, {}, 2, S.shuffle_different,
                             "ytb", True, "normal", _random)
