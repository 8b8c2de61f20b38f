"""Mask-RCNN person-detector parity (pipeline/maskrcnn.py).

torchvision is not installed in this environment, so the oracle is an
independent torch/functional re-implementation of the torchvision forward
semantics built directly from a torchvision-layout state dict (random
weights — the real checkpoint is an external asset, exactly like the
CLIP/WideResNet/AlexNet ports).  Covered:

  * backbone+FPN+RPN-head+box-head parity vs the torch oracle (<=1e-3)
  * roi_align vs a slow loop implementation of the C++ kernel spec
  * box decode / NMS golden cases (torchvision BoxCoder / ops.boxes)
  * end-to-end detect() + classify_person() driving the
    pipeline/filters.py smoothing path

Reference being reproduced: torchvision maskrcnn_resnet50_fpn inference,
as invoked by /root/reference/scripts/video_process/
filter_outdoor_maskrcnn_coco.py:87-120.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtube_vln_tpu.pipeline import maskrcnn as M

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# --------------------------------------------------------------------------- #
# torchvision-layout random state dict + independent torch forward
# --------------------------------------------------------------------------- #
def _rand_sd(rng):
    """Random weights under torchvision maskrcnn_resnet50_fpn names."""
    t = lambda *s: torch.from_numpy(
        rng.normal(scale=0.05, size=s).astype(np.float32))
    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = t(c).abs() + 0.5
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        sd[f"{name}.running_var"] = t(c).abs() + 0.5

    B = "backbone.body"
    sd[f"{B}.conv1.weight"] = t(64, 3, 7, 7)
    add_bn(f"{B}.bn1", 64)
    cin = 64
    for li, n in enumerate(M.RESNET50_BLOCKS):
        planes = 64 * 2 ** li
        out = planes * 4
        for bi in range(n):
            base = f"{B}.layer{li + 1}.{bi}"
            sd[f"{base}.conv1.weight"] = t(planes, cin, 1, 1)
            add_bn(f"{base}.bn1", planes)
            sd[f"{base}.conv2.weight"] = t(planes, planes, 3, 3)
            add_bn(f"{base}.bn2", planes)
            sd[f"{base}.conv3.weight"] = t(out, planes, 1, 1)
            add_bn(f"{base}.bn3", out)
            if bi == 0:
                sd[f"{base}.downsample.0.weight"] = t(out, cin, 1, 1)
                add_bn(f"{base}.downsample.1", out)
            cin = out
    for i, c in enumerate((256, 512, 1024, 2048)):
        sd[f"backbone.fpn.inner_blocks.{i}.weight"] = t(256, c, 1, 1)
        sd[f"backbone.fpn.inner_blocks.{i}.bias"] = t(256)
        sd[f"backbone.fpn.layer_blocks.{i}.weight"] = t(256, 256, 3, 3)
        sd[f"backbone.fpn.layer_blocks.{i}.bias"] = t(256)
    sd["rpn.head.conv.weight"] = t(256, 256, 3, 3)
    sd["rpn.head.conv.bias"] = t(256)
    sd["rpn.head.cls_logits.weight"] = t(3, 256, 1, 1)
    sd["rpn.head.cls_logits.bias"] = t(3)
    sd["rpn.head.bbox_pred.weight"] = t(12, 256, 1, 1)
    sd["rpn.head.bbox_pred.bias"] = t(12)
    sd["roi_heads.box_head.fc6.weight"] = t(1024, 256 * 49)
    sd["roi_heads.box_head.fc6.bias"] = t(1024)
    sd["roi_heads.box_head.fc7.weight"] = t(1024, 1024)
    sd["roi_heads.box_head.fc7.bias"] = t(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(91, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = t(91)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(364, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(364)
    return sd


def _t_bn(x, sd, name):
    w = sd[f"{name}.weight"]
    b = sd[f"{name}.bias"]
    rm = sd[f"{name}.running_mean"]
    rv = sd[f"{name}.running_var"]
    scale = (w / torch.sqrt(rv + 1e-5)).reshape(1, -1, 1, 1)
    shift = (b - rm * w / torch.sqrt(rv + 1e-5)).reshape(1, -1, 1, 1)
    return x * scale + shift


def _t_backbone_fpn(sd, x):
    """Independent torch forward with the torchvision architecture."""
    B = "backbone.body"
    x = F.relu(_t_bn(F.conv2d(x, sd[f"{B}.conv1.weight"], None, 2, 3),
                     sd, f"{B}.bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    cs = []
    for li, n in enumerate(M.RESNET50_BLOCKS):
        for bi in range(n):
            base = f"{B}.layer{li + 1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            out = F.relu(_t_bn(F.conv2d(x, sd[f"{base}.conv1.weight"]),
                               sd, f"{base}.bn1"))
            out = F.relu(_t_bn(F.conv2d(out, sd[f"{base}.conv2.weight"],
                                        None, stride, 1), sd, f"{base}.bn2"))
            out = _t_bn(F.conv2d(out, sd[f"{base}.conv3.weight"]),
                        sd, f"{base}.bn3")
            if f"{base}.downsample.0.weight" in sd:
                x = _t_bn(F.conv2d(x, sd[f"{base}.downsample.0.weight"],
                                   None, stride), sd, f"{base}.downsample.1")
            x = F.relu(out + x)
        cs.append(x)
    inner = [F.conv2d(c, sd[f"backbone.fpn.inner_blocks.{i}.weight"],
                      sd[f"backbone.fpn.inner_blocks.{i}.bias"])
             for i, c in enumerate(cs)]
    outs = [None] * 4
    last = inner[3]
    outs[3] = F.conv2d(last, sd["backbone.fpn.layer_blocks.3.weight"],
                       sd["backbone.fpn.layer_blocks.3.bias"], 1, 1)
    for i in (2, 1, 0):
        up = F.interpolate(last, size=inner[i].shape[-2:], mode="nearest")
        last = inner[i] + up
        outs[i] = F.conv2d(last, sd[f"backbone.fpn.layer_blocks.{i}.weight"],
                           sd[f"backbone.fpn.layer_blocks.{i}.bias"], 1, 1)
    outs.append(F.max_pool2d(outs[3], 1, 2, 0))
    return outs


@pytest.fixture(scope="module")
def sd_and_params():
    sd = _rand_sd(np.random.default_rng(0))
    return sd, M.params_from_torch_state_dict(sd)


def test_backbone_fpn_rpn_boxhead_parity(sd_and_params):
    sd, params = sd_and_params
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 96, 128, 3)).astype(np.float32)

    ours = M.backbone_fpn(params, jnp.asarray(img))
    with torch.no_grad():
        theirs = _t_backbone_fpn(
            sd, torch.from_numpy(np.transpose(img, (0, 3, 1, 2))))
    for lvl, (a, b) in enumerate(zip(ours, theirs)):
        got = np.asarray(a)
        exp = np.transpose(b.numpy(), (0, 2, 3, 1))
        scale = max(np.abs(exp).max(), 1.0)
        np.testing.assert_allclose(got, exp, atol=1e-3 * scale,
                                   err_msg=f"P{lvl + 2}")

    # RPN head on P2
    obj, deltas = M.rpn_head(params, [jnp.asarray(np.asarray(ours[0]))])[0]
    with torch.no_grad():
        t = F.relu(F.conv2d(theirs[0], sd["rpn.head.conv.weight"],
                            sd["rpn.head.conv.bias"], 1, 1))
        t_obj = F.conv2d(t, sd["rpn.head.cls_logits.weight"],
                         sd["rpn.head.cls_logits.bias"])
        t_del = F.conv2d(t, sd["rpn.head.bbox_pred.weight"],
                         sd["rpn.head.bbox_pred.bias"])
    np.testing.assert_allclose(np.asarray(obj),
                               np.transpose(t_obj.numpy(), (0, 2, 3, 1)),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(deltas),
                               np.transpose(t_del.numpy(), (0, 2, 3, 1)),
                               atol=2e-3)

    # box head + predictor on random pooled features (CHW flatten order)
    pooled = rng.normal(size=(5, 7, 7, 256)).astype(np.float32)
    cls, box = M.box_head(params, jnp.asarray(pooled))
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(pooled, (0, 3, 1, 2))).flatten(1)
        xt = F.relu(xt @ sd["roi_heads.box_head.fc6.weight"].T
                    + sd["roi_heads.box_head.fc6.bias"])
        xt = F.relu(xt @ sd["roi_heads.box_head.fc7.weight"].T
                    + sd["roi_heads.box_head.fc7.bias"])
        t_cls = xt @ sd["roi_heads.box_predictor.cls_score.weight"].T \
            + sd["roi_heads.box_predictor.cls_score.bias"]
        t_box = xt @ sd["roi_heads.box_predictor.bbox_pred.weight"].T \
            + sd["roi_heads.box_predictor.bbox_pred.bias"]
    np.testing.assert_allclose(np.asarray(cls), t_cls.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(box), t_box.numpy(), atol=2e-3)


def _roi_align_loop(feat, rois, scale, out_size=7, n=2):
    """Slow loop implementation of torchvision's roi_align C++ kernel
    (aligned=False), written from the spec independently of the JAX one."""
    h, w, c = feat.shape
    res = np.zeros((len(rois), out_size, out_size, c), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for iy in range(n):
                    y = y1 + (i + (iy + 0.5) / n) * bh
                    if y < -1.0 or y > h:
                        continue
                    y = min(max(y, 0.0), h - 1)
                    ylo = int(np.floor(y))
                    yhi = min(ylo + 1, h - 1)
                    fy = y - ylo
                    for ix in range(n):
                        x = x1 + (j + (ix + 0.5) / n) * bw
                        if x < -1.0 or x > w:
                            continue
                        x = min(max(x, 0.0), w - 1)
                        xlo = int(np.floor(x))
                        xhi = min(xlo + 1, w - 1)
                        fx = x - xlo
                        acc += ((1 - fy) * (1 - fx) * feat[ylo, xlo]
                                + (1 - fy) * fx * feat[ylo, xhi]
                                + fy * (1 - fx) * feat[yhi, xlo]
                                + fy * fx * feat[yhi, xhi])
                res[r, i, j] = acc / (n * n)
    return res


def test_roi_align_matches_loop_reference():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(24, 32, 8)).astype(np.float32)
    rois = np.asarray([
        [4.0, 4.0, 60.0, 40.0],
        [0.0, 0.0, 10.0, 10.0],
        [-6.0, -6.0, 20.0, 30.0],      # partially out of bounds
        [100.0, 80.0, 140.0, 120.0],   # fully below/right (clamps/zeros)
        [13.3, 7.7, 14.1, 9.9],        # sub-bin-size roi (min 1.0 width)
    ], np.float32)
    scale = 0.25
    ours = np.asarray(M.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                  scale, 7, 2))
    exp = _roi_align_loop(feat, rois, scale)
    np.testing.assert_allclose(ours, exp, atol=1e-5)


def test_box_decode_golden():
    """BoxCoder.decode_single formula, incl. the log(1000/16) clamp."""
    boxes = np.asarray([[10.0, 20.0, 30.0, 60.0]], np.float32)  # w20 h40
    deltas = np.asarray([[0.5, -0.25, np.log(2.0), 0.0]], np.float32)
    out = M.decode_boxes(deltas, boxes)
    # ctr (20, 40) -> (30, 30); w 40, h 40
    np.testing.assert_allclose(out, [[10.0, 10.0, 50.0, 50.0]], atol=1e-4)
    big = np.asarray([[0.0, 0.0, 100.0, 0.0]], np.float32)
    out = M.decode_boxes(big, boxes)
    assert np.isfinite(out).all()  # dw clamped at log(1000/16)
    np.testing.assert_allclose(out[0, 2] - out[0, 0], 20 * 1000 / 16,
                               rtol=1e-5)


def test_nms_golden():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = M.nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, [0, 2])
    # batched: same boxes in different categories never suppress
    keep = M.batched_nms(boxes, scores, np.asarray([0, 1, 0]), 0.5)
    np.testing.assert_array_equal(sorted(keep), [0, 1, 2])


def test_detect_end_to_end_and_person_filter(sd_and_params):
    """Full detect() on random weights: valid sorted detections, and
    classify_person feeds the reference smoothing/filter path."""
    _, params = sd_and_params
    det = M.MaskRCNNDetector(params)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(64, 96, 3)).astype(np.uint8)
    out = det.detect(img, resize=False)
    assert set(out) == {"boxes", "labels", "scores"}
    assert len(out["boxes"]) == len(out["labels"]) == len(out["scores"])
    assert len(out["boxes"]) <= M.DETECTIONS_PER_IMG
    if len(out["scores"]) > 1:
        assert (np.diff(out["scores"]) <= 1e-6).all()  # sorted desc
        assert (out["scores"] > M.BOX_SCORE_THRESH).all()
        assert (out["labels"] >= 1).all()
    flag = det.classify_person(img, resize=False)
    assert isinstance(flag, (bool, np.bool_))

    from youtube_vln_tpu.pipeline import filters
    person_flags = [bool(flag)] * 10
    indoor = [0.9] * 10
    data = filters.filter_frames(
        indoor, person_flags, [f"{i:04d}.jpg" for i in range(10)])
    assert "person_locs" in data and "indoor_locs" in data


def test_preprocess_downscale_matches_torch_interpolate(sd_and_params):
    """The min-800/max-1333 resize path vs torch F.interpolate(bilinear,
    antialias=False) — torchvision GeneralizedRCNNTransform semantics.
    jax.image.resize defaults antialias=True, which low-passes on
    downscale and would shift detection scores on large video frames."""
    _, params = sd_and_params
    det = M.MaskRCNNDetector(params, min_size=48, max_size=64)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(96, 130, 3)).astype(np.uint8)
    padded, (h, w), orig_hw = det._preprocess(img, resize=True)
    assert orig_hw == (96, 130)

    x = torch.from_numpy(np.asarray(img, np.float32) / 255.0)
    x = (x - torch.from_numpy(M.IMAGENET_MEAN)) \
        / torch.from_numpy(M.IMAGENET_STD)
    x = x.permute(2, 0, 1)[None]
    scale = min(48 / 96, 64 / 130)
    with torch.no_grad():
        out = F.interpolate(x, scale_factor=scale, mode="bilinear",
                            recompute_scale_factor=True,
                            align_corners=False)
    exp = out[0].permute(1, 2, 0).numpy()
    assert (h, w) == exp.shape[:2]
    np.testing.assert_allclose(padded[:h, :w], exp, atol=2e-5)
    # padding region stays zero (stride-32 alignment)
    assert padded.shape[0] % 32 == 0 and padded.shape[1] % 32 == 0
    assert np.all(padded[h:] == 0) and np.all(padded[:, w:] == 0)


def test_run_maskrcnn_filter_driver(sd_and_params, tmp_path):
    """Step-5b driver: per-video resume + artifact with both REAL networks
    (AlexNet indoor scorer + Mask-RCNN person detector), reference
    filter_outdoor_maskrcnn_coco.py:158-180."""
    from youtube_vln_tpu.pipeline import filters, places365

    _, params = sd_and_params
    det = M.MaskRCNNDetector(params, min_size=64, max_size=96)
    alex = places365.init_alexnet_params(jax.random.PRNGKey(0),
                                         num_classes=365)
    rng = np.random.default_rng(4)
    frames_dir = tmp_path / "raw_frames"
    for vid in ("vidA", "vidB"):
        d = frames_dir / vid
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, size=(256, 256, 3)).astype(np.uint8)
            try:
                from PIL import Image
                Image.fromarray(arr).save(d / f"{i:04d}.jpg")
            except ImportError:
                pytest.skip("PIL unavailable")

    out = tmp_path / "indoor_frames_maskrcnn_coco"
    is_indoor = rng.integers(0, 2, size=365).astype(bool)
    n = filters.run_maskrcnn_filter(frames_dir, out, alex, is_indoor, det)
    assert n == 2
    data = filters.load_maskrcnn_filters(out / "vidA" / "vidA.json")
    assert set(data) == {"indoor_locs", "person_locs"}
    # resume: nothing reprocessed
    assert filters.run_maskrcnn_filter(frames_dir, out, alex, is_indoor,
                                       det) == 0
