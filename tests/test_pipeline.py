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
# step-1 download recipe (gated; downloader injectable)
# --------------------------------------------------------------------------- #
def test_download_recipe_resume_backoff_failures(tmp_path):
    from youtube_vln_tpu.pipeline import frames as FR

    vids = ["aaa", "bbb", "ccc", "ddd"]
    out = tmp_path / "videos"
    out.mkdir()
    (out / "aaa.mp4").write_bytes(b"x")       # already downloaded

    # gated: no downloader, no egress -> presence validation only
    assert FR.download_videos(vids, out) == ["aaa"]

    opts = FR.build_ydl_opts(out, proxy_ip="1.2.3.4")
    assert opts["proxy"] == "socks5://1.2.3.4:1080"
    assert opts["format"].startswith("bestvideo[ext=mp4]")
    assert opts["outtmpl"].endswith("%(id)s.%(ext)s")

    calls, sleeps = [], []

    def fake_downloader(url):
        vid = url.split("=")[-1]
        calls.append(vid)
        if vid == "bbb" and calls.count("bbb") < 3:
            raise FR.RetryableDownloadError()   # 429-style, then succeeds
        if vid == "ccc":
            raise RuntimeError("SME blocked")   # permanent failure
        (out / f"{vid}.mp4").write_bytes(b"x")

    got = FR.download_videos(vids, out, downloader=fake_downloader,
                             sleep_fn=sleeps.append)
    assert got == ["aaa", "bbb", "ddd"]
    assert sleeps == [10.0, 20.0]               # exponential backoff
    assert calls.count("aaa") == 0              # resume skipped it


# --------------------------------------------------------------------------- #
# step-3 sharded extraction driver (multi-process, resume-from-partial)
# --------------------------------------------------------------------------- #
def _make_frames_tree(root, n_videos=2, n_frames=6):
    from PIL import Image
    rng = np.random.default_rng(1)
    photos = []
    for v in range(n_videos):
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        for f in range(n_frames):
            img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            p = d / f"{f:04d}.jpg"
            Image.fromarray(img).save(p)
            photos.append(p)
    return photos


def _extractor_factory(shard_id):
    return D.RandomProposalExtractor(num_boxes=4, seed=shard_id)


def test_extraction_sharded_pool_and_resume(tmp_path):
    """11-shard-style TSV production with a worker pool; a second run
    resumes from the partial output and only processes pending photos
    (reference precompute_...py:205-259,459-567)."""
    from youtube_vln_tpu.pipeline import extraction as E

    frames = tmp_path / "raw_frames"
    photos = _make_frames_tree(frames)
    out = tmp_path / "img_features"

    # full first pass through the worker pool: 3 shards, all photos
    n1 = E.run_extraction(frames, out, _extractor_factory, num_splits=3,
                          num_workers=3)
    shards = sorted(out.glob("ResNet-101-faster-rcnn-genome-*.tsv"))
    assert len(shards) == 3
    assert n1 == len(photos)

    # simulate an interrupted run: shard 2 lost all but its first row
    lines = shards[2].read_text().splitlines(keepends=True)
    assert len(lines) == 4
    shards[2].write_text(lines[0])

    # resume: pending = all - finished; the caches must be rebuilt
    for f in (out / "Extra").glob("*.txt"):
        f.unlink()
    n2 = E.run_extraction(frames, out, _extractor_factory, num_splits=3,
                          num_workers=3, start=0)
    assert n2 == 3  # exactly the truncated rows are re-extracted

    # every photo lands in the store exactly once
    store_path = tmp_path / "all.vlnstore"
    shards = sorted(out.glob("ResNet-101-faster-rcnn-genome-*.tsv"))
    n = D.convert_tsv_to_store(shards, store_path)
    assert n == len(photos)
    from youtube_vln_tpu.data.store import Store
    st = Store(store_path)
    assert set(st.keys) == {f"vid{v}/{f:04d}" for v in range(2)
                            for f in range(6)}
    rec = st.get("vid0/0000")
    assert rec.features.shape == (4, 2048)


def test_extraction_shard_count_guard(tmp_path):
    """Mismatched shard count aborts, like the reference main (:532-538)."""
    from youtube_vln_tpu.pipeline import extraction as E
    frames = tmp_path / "raw_frames"
    _make_frames_tree(frames, n_videos=1, n_frames=2)
    out = tmp_path / "img_features"
    out.mkdir()
    (out / E.SHARD_TEMPLATE.format(0)).touch()
    (out / E.SHARD_TEMPLATE.format(1)).touch()
    with pytest.raises(ValueError, match="not equal to the number"):
        E.run_extraction(frames, out, _extractor_factory, num_splits=5,
                         num_workers=1)


def test_redundancy_filter_keeps_best(rng):
    """Near-duplicate features: the lower-scoring member of the closest
    pair is dropped first (reference filter, :411-452)."""
    from youtube_vln_tpu.pipeline import extraction as E

    feats = rng.normal(size=(6, 32)).astype(np.float32)
    feats[1] = feats[0] + 1e-4        # near-duplicate pair (0, 1)
    heading = np.zeros((6, 1), np.float32)
    cls_prob = rng.random((6, 10)).astype(np.float32)
    cls_prob[0, 1:] = 0.9             # 0 outscores 1
    cls_prob[1, 1:] = 0.1
    record = {
        "features": feats, "boxes": rng.random((6, 4)).astype(np.float32),
        "cls_prob": cls_prob, "attr_prob": np.zeros((6, 0), np.float32),
        "featureViewIndex": np.zeros((6, 1), np.float32),
        "featureHeading": heading,
        "featureElevation": np.zeros((6, 1), np.float32),
    }
    E.redundancy_filter(record, max_boxes=5)
    assert record["features"].shape[0] == 5
    # row 1 (the weaker duplicate) is gone; row 0 survives
    assert not any(np.allclose(record["features"][i], feats[1])
                   for i in range(5))
    assert any(np.allclose(record["features"][i], feats[0])
               for i in range(5))


def test_box_orientation_wraps():
    from youtube_vln_tpu.pipeline import extraction as E
    boxes = np.array([[0, 0, 600, 600],        # centered -> heading 0
                      [500, 0, 600, 100]], np.float32)
    heading, elevation = E.compute_box_orientation(boxes, 600, 600)
    assert abs(heading[0, 0]) < 1e-6
    assert heading[1, 0] > 0 and elevation[1, 0] > 0
    assert (-np.pi < heading).all() and (heading <= np.pi).all()


def test_make_record_foc_scales_with_image_height():
    """The focal length must come from THIS image's height (r5 review
    finding): the module FOC is only valid for 600px-high frames — the
    reference resizes to 600x600 before detection, a pluggable detector
    may not.  A box at a fixed FRACTION of the frame must get the same
    heading/elevation at 600px and at 720p."""
    import math

    from youtube_vln_tpu.pipeline import extraction as E

    def rec_for(h, w):
        # box spanning the same fractional extent of the image
        boxes = np.array([[0.7 * w, 0.2 * h, 0.9 * w, 0.4 * h]], np.float32)
        feats = np.ones((1, 4), np.float32)
        probs = np.ones((1, 3), np.float32)
        img = np.zeros((h, w, 3), np.uint8)
        return E.make_record("v", "0001", img, boxes, feats, probs)

    r600 = rec_for(600, 600)
    r720 = rec_for(720, 1280)
    # same VERTICAL fraction -> same elevation regardless of resolution
    np.testing.assert_allclose(r720["featureElevation"],
                               r600["featureElevation"], rtol=1e-6)
    # heading through the pinhole model with foc = (h/2)/tan(VFOV/2)
    foc = (720 / 2) / math.tan(math.radians(E.VFOV / 2))
    exp = np.arctan2(0.8 * 1280 - 1280 / 2, foc)
    np.testing.assert_allclose(r720["featureHeading"][0, 0], exp, rtol=1e-6)


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
    # reference payload layout (generate_CLIP_captions.py:98-101):
    # [caption, {"ShannonEntropy": H}, {"similarity": top1_area_prob}]
    entry = payload["0003.jpg"]
    assert entry[0] == "kitchen with sink"
    f32 = frames[0].astype(np.float32)
    a32 = area_emb.astype(np.float32)
    f = f32 / np.linalg.norm(f32)
    a = a32 / np.linalg.norm(a32, axis=-1, keepdims=True)
    logits = 100.0 * (a @ f)
    p = np.exp(logits - logits.max())
    p /= p.sum()
    np.testing.assert_allclose(entry[2]["similarity"], p.max(), rtol=1e-5)
    q = p + 1e-7  # the reference shifts BOTH factors of p*log2(p)
    np.testing.assert_allclose(entry[1]["ShannonEntropy"],
                               -(q * np.log2(q)).sum(), rtol=1e-5)


# --------------------------------------------------------------------------- #
# Places365 indoor classifier (step 5a)
# --------------------------------------------------------------------------- #
def _ref_wideresnet():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_wideresnet",
        "/root/reference/scripts/video_process/wideresnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_places365_matches_torch_reference(rng):
    """Random-weight parity vs the vendored reference module
    (wideresnet.py:96-171): logits + both hooked features."""
    import torch
    from youtube_vln_tpu.pipeline import places365 as P

    wrn = _ref_wideresnet()
    torch.manual_seed(0)
    model = wrn.resnet18(num_classes=11).eval()
    # the driver swaps in this avgpool (filter_outdoor_resnet_place365.py:144)
    model.avgpool = torch.nn.AvgPool2d(kernel_size=14, stride=1, padding=0)

    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
    feats = []
    model.layer4.register_forward_hook(
        lambda m, i, o: feats.append(o.detach().numpy()))
    model.avgpool.register_forward_hook(
        lambda m, i, o: feats.append(o.detach().numpy()))
    with torch.no_grad():
        ref_logits = model(torch.from_numpy(x)).numpy()

    params = P.params_from_torch_state_dict(model.state_dict())
    logits, layer4, pooled = P.places_forward(
        params, np.transpose(x, (0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(layer4),
                               feats[0].transpose(0, 2, 3, 1), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               feats[1].reshape(2, -1), atol=2e-4, rtol=1e-4)


def test_places365_indoor_scorer_drives_filter(rng):
    """score_batch/is_indoor/indoor_scores reproduce the reference vote
    (filter_outdoor_resnet_place365.py:202-268) and feed
    filters.indoor_filter."""
    from youtube_vln_tpu.pipeline import places365 as P
    import jax

    params = P.init_places_params(jax.random.PRNGKey(0), num_classes=20)
    labels_io = rng.integers(0, 2, size=20).astype(np.float64)
    classes = [f"class{i}" for i in range(20)]
    labels_attr = [f"attr{i}" for i in range(6)]
    w_attr = rng.normal(size=(6, 512)).astype(np.float32)

    frames = (rng.random((3, 40, 60, 3)) * 255).astype(np.uint8)
    imgs = P.preprocess_images(frames)
    assert imgs.shape == (3, 224, 224, 3)

    dets = P.score_batch(params, imgs, labels_io=labels_io, classes=classes,
                         labels_attribute=labels_attr, w_attribute=w_attr,
                         num_cat=5, num_attr=4)
    assert len(dets) == 3
    for det in dets:
        io_image, indoor = det["is_indoor"]
        assert indoor == (io_image < 0.5)
        assert len(det["category"]) == 5
        assert len(det["attributes"]) == 3   # range(-1, -4, -1)
        # categories sorted by prob desc
        ps = [p for p, _ in det["category"]]
        assert ps == sorted(ps, reverse=True)

    scores = P.indoor_scores(params, frames, labels_io)
    kept = FL.indoor_filter([0, 1, 2], scores)
    assert kept == [i for i, s in enumerate(scores) if s > 0.5]
    # the vote and the strict-threshold filter agree EVERYWHERE,
    # including the reachable io==0.5 boundary (5/5 top-10 vote): the
    # reference's `io_image < 0.5` rejects it
    for s, det in zip(scores, dets):
        io_image, indoor = det["is_indoor"]
        assert s == pytest.approx(1.0 - io_image)
        assert indoor == (s > 0.5)
    assert FL.indoor_filter([7], [0.5]) == []   # boundary pin


# --------------------------------------------------------------------------- #
# step-5b driver logic (smoothing + artifact, person model pluggable)
# --------------------------------------------------------------------------- #
def test_maskrcnn_driver_smoothing_and_artifact():
    """indoor_probability / gaussian+window smoothing / filter_frames
    reproduce filter_outdoor_maskrcnn_coco.py:114-166 semantics."""
    # indoor probability = mass of indoor classes among the top-10
    probs = np.zeros(20)
    probs[3], probs[7], probs[11] = 0.5, 0.3, 0.2
    is_indoor = np.zeros(20)
    is_indoor[3] = 1
    is_indoor[11] = 1
    assert FL.indoor_probability(probs, is_indoor) == pytest.approx(0.7)

    # a short outdoor blip inside a long indoor run is smoothed away
    io = [0.9] * 10 + [0.1] + [0.9] * 10
    sm = FL.gaussian_smooth_round(io, sigma=6)
    assert sm.tolist() == [1] * 21

    # person flags: isolated detection vanishes; the reference's in-place
    # cascade (round-half-even at exactly 0.5) only lets runs survive when
    # they reach into the untouched leading window
    person = [0] * 8 + [1] + [0] * 8
    assert FL.smooth_window_round(person).sum() == 0
    person = [1] * 9 + [0] * 8
    assert FL.smooth_window_round(person).sum() > 0

    files = ["%04d.jpg" % i for i in range(21)]
    data = FL.filter_frames(io, [False] * 21, files)
    assert data["indoor_locs"] == files
    assert data["person_locs"] == []


def test_run_indoor_filter_artifacts(tmp_path):
    """Step 5a per-video driver: indoor.tsv + indoor_order.tsv + skip
    semantics (filter_outdoor_resnet_place365.py:271-361)."""
    import jax
    from youtube_vln_tpu.pipeline import places365 as P

    frames = tmp_path / "raw_frames"
    _make_frames_tree(frames, n_videos=2, n_frames=4)
    params = P.init_places_params(jax.random.PRNGKey(2), num_classes=12)
    labels_io = np.zeros(12)      # every class indoor -> all frames kept
    out = tmp_path / "indoor_frames"

    n = FL.run_indoor_filter(frames, out, params, labels_io, batch_size=3)
    assert n == 2
    rows = (out / "vid0" / "indoor.tsv").read_text().splitlines()
    assert rows == [f"vid0\t{i}" for i in range(4)]
    assert "[0, 1, 2, 3]" in (out / "vid0" / "indoor_order.tsv").read_text()

    # second run skips existing outputs
    assert FL.run_indoor_filter(frames, out, params, labels_io) == 0


def test_places365_feeds_maskrcnn_driver():
    """Step 5b end-to-end from pixels with the JAX Places365 scorer."""
    import jax
    from youtube_vln_tpu.pipeline import places365 as P

    rng = np.random.default_rng(11)
    params = P.init_places_params(jax.random.PRNGKey(1), num_classes=16)
    frames = (rng.random((5, 36, 48, 3)) * 255).astype(np.uint8)
    is_indoor = rng.integers(0, 2, 16)
    probs = FL.places365_indoor_probs(params, frames, is_indoor,
                                      batch_size=2)
    assert len(probs) == 5
    assert all(0.0 <= p <= 1.0 + 1e-6 for p in probs)


# --------------------------------------------------------------------------- #
# CLIP encoders (step 6 backbone)
# --------------------------------------------------------------------------- #
def test_clip_matches_hf_reference(rng):
    """Random-weight parity vs transformers.CLIPModel (the HF port of the
    OpenAI encoder the reference loads, precomute_CLIP_features.py:70-77):
    get_image_features / get_text_features on a tiny config."""
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, \
        CLIPVisionConfig
    from youtube_vln_tpu.pipeline import clip_model as CM

    vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=32, patch_size=8,
                            hidden_act="quick_gelu")
    tcfg = CLIPTextConfig(hidden_size=24, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=2,
                          vocab_size=50, max_position_embeddings=16,
                          hidden_act="quick_gelu", eos_token_id=49)
    hf_cfg = CLIPConfig.from_text_vision_configs(tcfg, vcfg,
                                                 projection_dim=20)
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg).eval()

    cfg = CM.ClipConfig(image_size=32, patch_size=8, v_hidden=32, v_layers=2,
                        v_heads=2, t_hidden=24, t_layers=2, t_heads=2,
                        vocab_size=50, context_length=16, proj_dim=20)
    params = CM.params_from_hf_state_dict(model.state_dict())

    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    # eot (id 49, the max) at a distinct position per row; all others < 49
    tokens = rng.integers(1, 48, size=(3, 16)).astype(np.int64)
    for i, pos in enumerate((5, 11, 15)):
        tokens[i, pos] = 49
        tokens[i, pos + 1:] = 0

    with torch.no_grad():
        ref_img = model.get_image_features(torch.from_numpy(pixels)).numpy()
        ref_txt = model.get_text_features(torch.from_numpy(tokens)).numpy()

    img = CM.clip_image_features(params, cfg,
                                 np.transpose(pixels, (0, 2, 3, 1)))
    txt = CM.clip_text_features(params, cfg, tokens.astype(np.int32))
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(txt), ref_txt, atol=1e-4,
                               rtol=1e-4)


def test_clip_tsv_build_and_resume(tmp_path):
    """Step 6a TSV production with resume-by-append
    (precomute_CLIP_features.py:48-104)."""
    import jax
    from youtube_vln_tpu.pipeline import clip_model as CM

    cfg = CM.ClipConfig(image_size=32, patch_size=8, v_hidden=32, v_layers=1,
                        v_heads=2, t_hidden=24, t_layers=1, t_heads=2,
                        vocab_size=64, context_length=12, proj_dim=20)
    params = CM.init_clip_params(jax.random.PRNGKey(0), cfg)
    frames = tmp_path / "raw_frames"
    _make_frames_tree(frames, n_videos=2, n_frames=3)
    tsv = tmp_path / "CLIP-ViT-B-32-views.tsv"

    n1 = CM.build_clip_tsv(params, cfg, frames, tsv)
    assert n1 == 6
    exist, feats = CM.read_clip_tsv(tsv, cfg.proj_dim)
    assert len(feats) == 6 and set(exist) == {"vid0", "vid1"}
    assert feats["vid0_0000.jpg"].shape == (1, 20)

    # resume: new frames only
    from PIL import Image
    Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(
        frames / "vid0" / "0009.jpg")
    n2 = CM.build_clip_tsv(params, cfg, frames, tsv)
    assert n2 == 1
    _, feats = CM.read_clip_tsv(tsv, cfg.proj_dim)
    assert len(feats) == 7


def test_clip_feeds_zero_shot_captions(rng):
    """encode_video_frames -> zero_shot_captions end-to-end from pixels
    (steps 6a+6b) with a random-init encoder."""
    import jax
    from youtube_vln_tpu.pipeline import clip_model as CM

    cfg = CM.ClipConfig(image_size=32, patch_size=8, v_hidden=32, v_layers=2,
                        v_heads=2, t_hidden=24, t_layers=2, t_heads=2,
                        vocab_size=64, context_length=12, proj_dim=20)
    params = CM.init_clip_params(jax.random.PRNGKey(0), cfg)

    frames = (rng.random((3, 48, 48, 3)) * 255).astype(np.uint8)
    emb = CM.encode_video_frames(params, cfg, frames, batch_size=2)
    assert emb.shape == (3, 20) and emb.dtype == np.float32

    def text_encoder(prompts):
        toks = np.zeros((len(prompts), cfg.context_length), np.int32)
        for i, p in enumerate(prompts):
            h = abs(hash(p))
            toks[i, :4] = [h % 31 + 1, h // 31 % 31 + 1, 63, 0][:4]
        return np.asarray(CM.clip_text_features(params, cfg, toks))

    area_emb = text_encoder([C.PROMPT.format(a) for a in C.AREAS])
    obj_emb = text_encoder([C.PROMPT.format(o) for o in C.OBJECTS])
    caps = C.zero_shot_captions(emb, area_emb, obj_emb)
    assert len(caps) == 3
    for cap in caps:
        room, obj = cap.split(" with ", 1)
        assert room in C.AREAS and obj in C.OBJECTS


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


def test_resnet18_backbone_matches_torch(rng):
    """Torchvision-style trunk (conv1/bn/relu/maxpool/layer1-4) parity:
    the reference ResNet class with the standard maxpool re-inserted is
    exactly the torchvision resnet18 children()[:-2] pair encoder
    (inverse_model.py:36-44)."""
    import torch
    from youtube_vln_tpu.pipeline import places365 as P

    wrn = _ref_wideresnet()
    torch.manual_seed(1)
    model = wrn.resnet18(num_classes=5).eval()
    mp = torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1)

    x = rng.normal(size=(1, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        h = model.relu(model.bn1(model.conv1(torch.from_numpy(x))))
        h = mp(h)
        ref = model.layer4(model.layer3(model.layer2(model.layer1(h))))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    params = P.params_from_torch_state_dict(model.state_dict())
    out = P.resnet18_backbone_forward(params, np.transpose(x, (0, 2, 3, 1)),
                                      maxpool=True)
    assert out.shape == (1, 7, 7, 512)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_inverse_action_learns_from_images():
    """Step 7 from raw frames: frozen random ResNet-18 features + the conv
    head must decode a synthetic action encoded in the next frame."""
    import jax
    from youtube_vln_tpu.pipeline import places365 as P

    rng = np.random.default_rng(5)  # local: independent of test order
    backbone = P.init_places_params(jax.random.PRNGKey(3), num_classes=3)
    n = 25
    actions = rng.integers(0, 3, size=n - 1).astype(np.int32)
    images = np.zeros((n, 32, 32, 3), np.uint8)
    images[0] = (rng.random((32, 32, 3)) * 60).astype(np.uint8)
    for i, a in enumerate(actions):
        base = (rng.random((32, 32, 3)) * 60).astype(np.uint8)
        base[..., :] += np.uint8(60 * a)        # action -> brightness level
        images[i + 1] = base

    params, losses = IA.train_inverse_model_from_images(
        images, actions, backbone, steps=80, lr=3e-3, feat_channels=512,
        seed=0)
    assert losses[-1] < losses[0]

    feats = IA.encode_frames(backbone, images)
    import jax.numpy as jnp
    logits = IA.inverse_forward(params, jnp.asarray(feats[:-1]),
                                jnp.asarray(feats[1:]))
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == actions))
    assert acc > 0.7, acc
    # predict_actions maps the same logits onto the action vocabulary
    names = IA.predict_actions(params, list(feats))
    assert len(names) == n - 1
    assert set(names) <= set(IA.ACTIONS)


def test_action_profiles(tmp_path):
    caps = {"%04d.jpg" % i: [f"room {i}"] for i in (1, 2, 3, 4, 5)}
    path = IA.write_action_profiles(
        tmp_path, "vid7",
        trajectories={"0": [1, 3, 5], "1": [2, 4]},
        actions_by_frame={1: "left", 3: "forward", 2: "right"},
        captions=caps)
    data = json.loads(path.read_text())
    assert data == [{"1": ["left"], "3": ["forward"]}, {"2": ["right"]}]
    # captions_pro.json: per-trajectory captions INCLUDING the last frame
    # (reference genearate_Profiles.py:55-62 writes both artifacts)
    cap_data = json.loads((path.parent / "captions_pro.json").read_text())
    assert cap_data == [{"1": "room 1", "3": "room 3", "5": "room 5"},
                        {"2": "room 2", "4": "room 4"}]


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
# asset manifest + cached_path (reference scripts/download.py +
# vilbert/file_utils.py)
# --------------------------------------------------------------------------- #
def test_cached_path_modes(tmp_path):
    from youtube_vln_tpu.utils import file_cache as FC

    # local paths pass through
    local = tmp_path / "x.json"
    local.write_text("{}")
    assert FC.cached_path(local) == local

    # cached URL resolves by sha256 name without touching the network
    url = "https://example.com/beams.json"
    cache = tmp_path / "cache"
    cache.mkdir()
    blob = cache / FC.url_to_filename(url)
    blob.write_text("cached")
    assert FC.cached_path(url, cache_dir=cache) == blob

    # uncached remote fetch is gated with actionable guidance
    with pytest.raises(FileNotFoundError, match="downloads are disabled"):
        FC.cached_path("https://example.com/missing.bin", cache_dir=cache)

    # etag-suffixed naming + metadata sidecar round-trip
    name = FC.url_to_filename(url, etag='"abc"')
    assert name.startswith(FC.url_to_filename(url)) and "." in name
    (cache / (name + ".json")).write_text(
        json.dumps({"url": url, "etag": '"abc"'}))
    got_url, got_etag = FC.filename_to_url(name, cache_dir=cache)
    assert (got_url, got_etag) == (url, '"abc"')

    # s3 path splitting (file_utils.py:109-120)
    assert FC.split_s3_path("s3://bucket/a/b.bin") == ("bucket", "a/b.bin")
    with pytest.raises(ValueError):
        FC.split_s3_path("s3://bucketonly")


def test_asset_manifest_complete(tmp_path):
    from youtube_vln_tpu.pipeline import assets as A

    # every reference download category is represented
    assert len(A.BEAMSEARCH_ASSETS) == 7      # beams x4 + scores x3
    assert len(A.TASK_ASSETS) == 4            # R2R_{test,train,val_*}
    assert len(A.SPEAKER_ASSETS) == 2
    assert len(A.CONFIG_ASSETS) == 1
    conn = A.connectivity_manifest()
    assert len(conn) == 92                    # 90 scans + README + scans.txt
    assert ("data/connectivity/17DRP5sb8fy_connectivity.json" in conn)

    # offline: everything is reported missing with guidance, nothing hangs
    missing = A.fetch_all(data_dir=tmp_path / "data")
    assert set(missing) == set(A.ASSETS)

    # locally-present assets resolve
    local = tmp_path / "data" / "task"
    local.mkdir(parents=True)
    (local / "R2R_test.json").write_text("[]")
    assert A.fetch("data/task/R2R_test.json",
                   data_dir=tmp_path / "data") is not None


def test_generate_distances_from_connectivity(tmp_path):
    """Distance tables regenerate from the fixture connectivity graphs
    (reference download.py:216-299)."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.pipeline import assets as A

    F.build_r2r_fixture(tmp_path / "data")
    for p in (tmp_path / "data" / "distances").glob("*.json"):
        p.unlink()
    written = A.generate_distances(tmp_path / "data")
    assert len(written) == 2
    d = json.loads(written[0].read_text())
    some_vp = next(iter(d))
    assert d[some_vp][some_vp] == 0.0


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


def test_assemble_records_trim_and_feature_errors():
    """Reference build_dataset.py:124-153: error-feature frames are
    dropped, and the manual filter_frame front/back trim drops
    frame_id <= front and >= back with negative values wrapping by
    n_frames+1 (0 disables that side)."""
    caps = {"v0": {"%04d.jpg" % i: ["kitchen with sink"]
                   for i in range(1, 7)}}
    recs = B.assemble_records(["v0"], caps, {},
                              feature_errors_by_video={"v0": [3]},
                              trim_by_video={"v0": {"front": 1,
                                                    "back": -1}})
    # n=6 frames: back=-1 -> 6 (drop >=6), front=1 (drop <=1), 3 is an
    # error feature -> surviving ids 2, 4, 5
    assert [r["frame_id"] for r in recs] == [2, 4, 5]
    # 0 disables a side
    recs = B.assemble_records(["v0"], caps, {},
                              trim_by_video={"v0": {"front": 0, "back": 0}})
    assert [r["frame_id"] for r in recs] == [1, 2, 3, 4, 5, 6]


def test_assemble_records_trajectory_semantics():
    """Reference build_dataset.py:178-195 semantics (r5 review finding):
    keyframe membership comes from the TRAJECTORY — the last trajectory
    frame keeps its caption with action '' (no outgoing action), and
    non-keyframe context frames get caption '' AND action '' (never
    'forward')."""
    caps = {"v0": {"0000.jpg": ["kitchen with sink"],
                   "0001.jpg": ["hallway with lamp"],
                   "0002.jpg": ["office with desk"]}}
    actions = {"v0": {0: "left"}}          # trajectory[:-1] only
    traj = {"v0": [0, 2]}                  # frame 1 is a context frame
    recs = B.assemble_records(["v0"], caps, actions,
                              trajectory_by_video=traj)
    by_id = {r["frame_id"]: r for r in recs}
    assert by_id[0] == {"video_id": "v0", "frame_id": 0,
                        "caption": "kitchen with sink", "action": "left"}
    # last trajectory frame: caption KEPT, action ""
    assert by_id[2] == {"video_id": "v0", "frame_id": 2,
                        "caption": "office with desk", "action": ""}
    # context frame: caption "" and action "" (not "forward")
    assert by_id[1] == {"video_id": "v0", "frame_id": 1,
                        "caption": "", "action": ""}


def test_preprocess_records_filters(tmp_path):
    """preprocess_dataset.py equivalents: TSV load, captionless toggle,
    per-video min_caption/min_length filters, artifacts."""
    rows = []
    # video A: 4 frames, 2 captioned -> keeps
    for i in range(4):
        rows.append(("vidA", i, "kitchen with sink" if i % 2 == 0 else "",
                     "forward"))
    # video B: enough frames, 1 caption -> dropped (min_caption)
    for i in range(5):
        rows.append(("vidB", i, "bedroom with bed" if i == 0 else "",
                     "left"))
    # video C: 2 captioned but too short -> dropped (min_length)
    rows += [("vidC", 0, "office with desk", "right"),
             ("vidC", 1, "porch with chair", "right")]
    tsv = tmp_path / "ytb_test.tsv"
    tsv.write_text("\n".join("\t".join(map(str, r)) for r in rows) + "\n")

    frames = B.load_frames_tsv(tsv)
    assert len(frames) == 11 and frames[0]["frame_id"] == 0

    by_video = B.preprocess_records(frames, min_caption=2, min_length=4)
    assert set(by_video) == {"vidA"}

    # captionless=False first drops empty-caption frames entirely
    by_video2 = B.preprocess_records(frames, min_caption=2, min_length=2,
                                     captionless=False)
    assert set(by_video2) == {"vidA", "vidC"}
    assert all(f["caption"] for items in by_video2.values() for f in items)

    json_path, txt_path = B.write_preprocessed(by_video, tmp_path / "ytb",
                                               "ytb_test")
    assert json.loads(json_path.read_text())[0]["video_id"] == "vidA"
    assert txt_path.read_text().split() == ["vidA"]


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


def test_alexnet_places365_matches_torch(rng):
    """Random-weight parity for step 5b's indoor scorer vs a torch oracle
    in the torchvision AlexNet layout the places365 checkpoint uses
    (filter_outdoor_maskrcnn_coco.py:49-66)."""
    import torch
    import torch.nn as nn
    from youtube_vln_tpu.pipeline import places365 as P

    class AlexNet(nn.Module):
        def __init__(self, num_classes=7):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(True), nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(3, 2))
            self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
            self.classifier = nn.Sequential(
                nn.Dropout(), nn.Linear(256 * 6 * 6, 4096), nn.ReLU(True),
                nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, num_classes))

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    torch.manual_seed(0)
    model = AlexNet().eval()
    x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    # DataParallel-style "module." prefixes must be tolerated
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    params = P.alexnet_params_from_torch_state_dict(sd)
    logits = P.alexnet_forward(params, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-4)


def test_alexnet_indoor_scorer_drives_person_filter(rng):
    """alexnet_indoor_probs (classify_indoors equivalent) produces valid
    per-frame probabilities from raw uint8 frames and feeds
    filters.filter_frames."""
    import jax
    from youtube_vln_tpu.pipeline import filters as FL
    from youtube_vln_tpu.pipeline import places365 as P

    params = P.init_alexnet_params(jax.random.PRNGKey(0), num_classes=9)
    frames = (rng.random((3, 60, 84, 3)) * 255).astype(np.uint8)
    is_indoor = np.array([1, 0, 1, 0, 0, 1, 0, 0, 1])
    probs = P.alexnet_indoor_probs(params, frames, is_indoor, batch_size=2)
    assert probs.shape == (3,)
    assert np.all((probs >= 0) & (probs <= 1))
    data = FL.filter_frames(probs, [0.0, 1.0, 0.0],
                            ["0001.jpg", "0002.jpg", "0003.jpg"])
    assert set(data) == {"indoor_locs", "person_locs"}
