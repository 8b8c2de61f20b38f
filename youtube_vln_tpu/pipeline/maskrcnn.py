"""Step 5b: Mask-RCNN (ResNet-50-FPN) person detector, TPU-native.

The reference drives torchvision's ``maskrcnn_resnet50_fpn(pretrained=True)``
for exactly one bit of information per frame: is a person among the top-5
detections (``scripts/video_process/filter_outdoor_maskrcnn_coco.py:87-118``:
``classify_person`` checks ``PERSON in predictions['labels'][:5]``), which
then drives the frame-drop smoothing in ``pipeline/filters.py``.  The mask
branch is therefore never needed — only the detection path:

  image -> normalize/resize -> ResNet-50 (frozen BN) -> FPN (P2..P6)
        -> RPN head -> proposals (decode + level-wise NMS)
        -> MultiScale RoIAlign (P2..P5) -> TwoMLP box head -> class scores
        -> per-class NMS -> top-100 detections sorted by score

This is a faithful re-implementation of the torchvision inference
semantics (torchvision/models/detection/{rpn,roi_heads,transform}.py and
ops/{poolers,boxes}.py), structured TPU-first: all conv/matmul stages are
pure jittable functions over a parameter pytree in NHWC/HWIO layout with
inference-mode (frozen) BatchNorm folded to scale/bias; the cheap control
glue (anchor enumeration, box decode, NMS, level assignment) runs in
numpy on the host, as it is O(1k) boxes of scalar work per frame.

Weights import from a torchvision ``state_dict()`` via
``params_from_torch_state_dict`` (both the pre-0.14 ``rpn.head.conv.weight``
and the newer ``rpn.head.conv.0.0.weight`` layouts are handled).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

PERSON_LABEL = 1          # COCO category id for 'person'
BN_EPS = 0.0              # FrozenBatchNorm2d uses eps=1e-5 in tv>=0.12;
FROZEN_BN_EPS = 1e-5      # folded at load time, see _fold_bn

# inference-time hyperparameters (torchvision MaskRCNN defaults)
RPN_PRE_NMS_TOP_N = 1000
RPN_POST_NMS_TOP_N = 1000
RPN_NMS_THRESH = 0.7
RPN_SCORE_THRESH = 0.0
RPN_MIN_SIZE = 1e-3
BOX_SCORE_THRESH = 0.05
BOX_NMS_THRESH = 0.5
DETECTIONS_PER_IMG = 100
NUM_CLASSES = 91
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


# --------------------------------------------------------------------------- #
# parameters
# --------------------------------------------------------------------------- #
def _conv_init(key, kh, kw, cin, cout, std=0.01):
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def _fc_init(key, cin, cout, std=0.01):
    return {"w": std * jax.random.normal(key, (cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _bn_fold(w, b, mean, var, eps=FROZEN_BN_EPS):
    """FrozenBatchNorm2d eval: y = (x - mean) * w/sqrt(var+eps) + b  ->
    one scale/shift pair."""
    scale = np.asarray(w, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    shift = np.asarray(b, np.float32) - np.asarray(mean, np.float32) * scale
    return {"scale": scale, "shift": shift}


def _rand_bn(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"scale": 1.0 + 0.1 * jax.random.normal(k1, (c,), jnp.float32),
            "shift": 0.1 * jax.random.normal(k2, (c,), jnp.float32)}


RESNET50_BLOCKS = (3, 4, 6, 3)


def init_maskrcnn_params(key) -> Dict:
    """Random parameters in the exact pytree layout the forward expects
    (useful for tests; real use imports a torchvision checkpoint)."""
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    p: Dict = {"stem": {"conv": _conv_init(nk(), 7, 7, 3, 64),
                        "bn": _rand_bn(nk(), 64)}}
    cin = 64
    for li, n in enumerate(RESNET50_BLOCKS):
        planes = 64 * (2 ** li)
        out = planes * 4
        blocks = []
        for bi in range(n):
            blk = {
                "conv1": _conv_init(nk(), 1, 1, cin, planes),
                "bn1": _rand_bn(nk(), planes),
                "conv2": _conv_init(nk(), 3, 3, planes, planes),
                "bn2": _rand_bn(nk(), planes),
                "conv3": _conv_init(nk(), 1, 1, planes, out),
                "bn3": _rand_bn(nk(), out),
            }
            if bi == 0:
                blk["down"] = {"conv": _conv_init(nk(), 1, 1, cin, out),
                               "bn": _rand_bn(nk(), out)}
            blocks.append(blk)
            cin = out
        p[f"layer{li + 1}"] = blocks
    p["fpn"] = {
        "inner": [{"w": _conv_init(nk(), 1, 1, c, 256),
                   "b": jnp.zeros((256,), jnp.float32)}
                  for c in (256, 512, 1024, 2048)],
        "layer": [{"w": _conv_init(nk(), 3, 3, 256, 256),
                   "b": jnp.zeros((256,), jnp.float32)}
                  for _ in range(4)],
    }
    p["rpn"] = {
        "conv": {"w": _conv_init(nk(), 3, 3, 256, 256),
                 "b": jnp.zeros((256,), jnp.float32)},
        "cls": {"w": _conv_init(nk(), 1, 1, 256, len(ANCHOR_RATIOS)),
                "b": jnp.zeros((len(ANCHOR_RATIOS),), jnp.float32)},
        "bbox": {"w": _conv_init(nk(), 1, 1, 256, 4 * len(ANCHOR_RATIOS)),
                 "b": jnp.zeros((4 * len(ANCHOR_RATIOS),), jnp.float32)},
    }
    p["box_head"] = {"fc6": _fc_init(nk(), 256 * 7 * 7, 1024),
                     "fc7": _fc_init(nk(), 1024, 1024)}
    p["box_pred"] = {"cls": _fc_init(nk(), 1024, NUM_CLASSES),
                     "bbox": _fc_init(nk(), 1024, NUM_CLASSES * 4)}
    return p


def params_from_torch_state_dict(state_dict: Dict) -> Dict:
    """torchvision ``maskrcnn_resnet50_fpn().state_dict()`` -> our pytree.

    Convs OIHW -> HWIO, linears [out,in] -> [in,out], FrozenBatchNorm
    folded to scale/shift.  The mask branch (roi_heads.mask_*) is ignored
    (never used by the reference filter)."""
    sd = {}
    for k, v in state_dict.items():
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    def conv(name):
        return np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))

    def conv_b(name):
        w = {"w": conv(name)}
        w["b"] = sd.get(f"{name}.bias",
                        np.zeros(w["w"].shape[-1], np.float32))
        return w

    def bn(name):
        return _bn_fold(sd[f"{name}.weight"], sd[f"{name}.bias"],
                        sd[f"{name}.running_mean"],
                        sd[f"{name}.running_var"])

    def fc(name):
        return {"w": np.ascontiguousarray(sd[f"{name}.weight"].T),
                "b": sd[f"{name}.bias"]}

    def pick(*names):
        for n in names:
            if f"{n}.weight" in sd:
                return n
        raise KeyError(names)

    B = "backbone.body"
    p: Dict = {"stem": {"conv": conv(f"{B}.conv1"), "bn": bn(f"{B}.bn1")}}
    for li, n in enumerate(RESNET50_BLOCKS):
        blocks = []
        for bi in range(n):
            base = f"{B}.layer{li + 1}.{bi}"
            blk = {
                "conv1": conv(f"{base}.conv1"), "bn1": bn(f"{base}.bn1"),
                "conv2": conv(f"{base}.conv2"), "bn2": bn(f"{base}.bn2"),
                "conv3": conv(f"{base}.conv3"), "bn3": bn(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["down"] = {"conv": conv(f"{base}.downsample.0"),
                               "bn": bn(f"{base}.downsample.1")}
            blocks.append(blk)
        p[f"layer{li + 1}"] = blocks

    p["fpn"] = {"inner": [], "layer": []}
    for i in range(4):
        inner = pick(f"backbone.fpn.inner_blocks.{i}",
                     f"backbone.fpn.inner_blocks.{i}.0")
        layer = pick(f"backbone.fpn.layer_blocks.{i}",
                     f"backbone.fpn.layer_blocks.{i}.0")
        p["fpn"]["inner"].append(conv_b(inner))
        p["fpn"]["layer"].append(conv_b(layer))

    rpn_conv = pick("rpn.head.conv", "rpn.head.conv.0.0")
    p["rpn"] = {"conv": conv_b(rpn_conv),
                "cls": conv_b("rpn.head.cls_logits"),
                "bbox": conv_b("rpn.head.bbox_pred")}
    p["box_head"] = {"fc6": fc("roi_heads.box_head.fc6"),
                     "fc7": fc("roi_heads.box_head.fc7")}
    p["box_pred"] = {"cls": fc("roi_heads.box_predictor.cls_score"),
                     "bbox": fc("roi_heads.box_predictor.bbox_pred")}
    return p


# --------------------------------------------------------------------------- #
# jitted compute stages (NHWC)
# --------------------------------------------------------------------------- #
def _conv(x, w, b=None, stride=1):
    # torch-style SYMMETRIC padding (k-1)//2 — XLA "SAME" pads
    # asymmetrically under stride 2, which diverges from torch convs
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y


def _bn(x, bn):
    return x * bn["scale"] + bn["shift"]


def _bottleneck(x, blk, stride):
    out = jax.nn.relu(_bn(_conv(x, blk["conv1"]), blk["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, blk["conv2"], stride=stride),
                          blk["bn2"]))
    out = _bn(_conv(out, blk["conv3"]), blk["bn3"])
    if "down" in blk:
        x = _bn(_conv(x, blk["down"]["conv"], stride=stride),
                blk["down"]["bn"])
    return jax.nn.relu(out + x)


def _max_pool(x, window, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def backbone_fpn(params, images: jnp.ndarray) -> List[jnp.ndarray]:
    """images [N, H, W, 3] (normalized) -> [P2, P3, P4, P5, P6] NHWC.

    torchvision: conv1(7x7/2) -> frozen-bn -> relu -> maxpool(3x3/2) ->
    layer1..4 -> FPN (1x1 lateral + nearest top-down + 3x3 smooth) +
    LastLevelMaxPool(P5, kernel 1 stride 2)."""
    x = jax.nn.relu(_bn(_conv(images, params["stem"]["conv"], stride=2),
                        params["stem"]["bn"]))
    x = _max_pool(x, 3, 2, 1)
    cs = []
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, blk in enumerate(params[f"layer{li + 1}"]):
            x = _bottleneck(x, blk, stride if bi == 0 else 1)
        cs.append(x)

    fpn = params["fpn"]
    inner = [_conv(c, w["w"], w["b"]) for c, w in zip(cs, fpn["inner"])]
    outs = [None] * 4
    last = inner[3]
    outs[3] = _conv(last, fpn["layer"][3]["w"], fpn["layer"][3]["b"])
    for i in (2, 1, 0):
        h, w = inner[i].shape[1], inner[i].shape[2]
        up = jax.image.resize(last, (last.shape[0], h, w, last.shape[3]),
                              method="nearest")
        last = inner[i] + up
        outs[i] = _conv(last, fpn["layer"][i]["w"], fpn["layer"][i]["b"])
    p6 = _max_pool(outs[3], 1, 2, 0)
    return outs + [p6]


def rpn_head(params, feats: Sequence[jnp.ndarray]):
    """-> per level (objectness [N,H,W,A], deltas [N,H,W,A*4])."""
    rpn = params["rpn"]
    out = []
    for f in feats:
        t = jax.nn.relu(_conv(f, rpn["conv"]["w"], rpn["conv"]["b"]))
        out.append((_conv(t, rpn["cls"]["w"], rpn["cls"]["b"]),
                    _conv(t, rpn["bbox"]["w"], rpn["bbox"]["b"])))
    return out


def box_head(params, pooled: jnp.ndarray):
    """pooled [R, 7, 7, 256] -> (class_logits [R, 91], deltas [R, 364]).

    torchvision flattens CHW order; our pooled is HWC, so transpose to
    CHW before the flatten to keep fc6 weights compatible."""
    r = pooled.shape[0]
    x = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(r, -1)
    x = jax.nn.relu(x @ params["box_head"]["fc6"]["w"]
                    + params["box_head"]["fc6"]["b"])
    x = jax.nn.relu(x @ params["box_head"]["fc7"]["w"]
                    + params["box_head"]["fc7"]["b"])
    return (x @ params["box_pred"]["cls"]["w"] + params["box_pred"]["cls"]["b"],
            x @ params["box_pred"]["bbox"]["w"]
            + params["box_pred"]["bbox"]["b"])


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              output_size: int = 7, sampling_ratio: int = 2) -> jnp.ndarray:
    """torchvision ``roi_align`` (aligned=False) on one NHWC feature map.

    feat [H, W, C]; rois [R, 4] (x1, y1, x2, y2) in IMAGE coordinates.
    Samples ``sampling_ratio**2`` bilinear points per output bin and
    averages.  Points with y < -1 or y > H (resp. x) contribute zero;
    otherwise coordinates clamp to the border (torchvision
    ops/roi_align semantics)."""
    h, w, c = feat.shape
    n = sampling_ratio
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    # sample coordinates [R, output, n] along each axis
    grid = (jnp.arange(output_size)[None, :, None]
            + (jnp.arange(n)[None, None, :] + 0.5) / n)  # [1, out, n]
    ys = y1[:, None, None] + grid * bin_h[:, None, None]
    xs = x1[:, None, None] + grid * bin_w[:, None, None]

    def sample_axis(v, size):
        valid = (v >= -1.0) & (v <= size)
        v = jnp.clip(v, 0.0, size - 1)
        lo = jnp.floor(v)
        frac = v - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return valid, lo, hi, frac

    yv, ylo, yhi, yfrac = sample_axis(ys, h)
    xv, xlo, xhi, xfrac = sample_axis(xs, w)

    # gather the 4 corners for every (roi, bin_y, sample_y, bin_x, sample_x)
    def gather(yi, xi):
        # yi [R, out, n] ; xi [R, out, n] -> [R, out, n, out, n, C]
        return feat[yi[:, :, :, None, None], xi[:, None, None, :, :]]

    w00 = ((1 - yfrac)[:, :, :, None, None]
           * (1 - xfrac)[:, None, None, :, :])
    w01 = (1 - yfrac)[:, :, :, None, None] * xfrac[:, None, None, :, :]
    w10 = yfrac[:, :, :, None, None] * (1 - xfrac)[:, None, None, :, :]
    w11 = yfrac[:, :, :, None, None] * xfrac[:, None, None, :, :]
    acc = (gather(ylo, xlo) * w00[..., None] + gather(ylo, xhi) * w01[..., None]
           + gather(yhi, xlo) * w10[..., None]
           + gather(yhi, xhi) * w11[..., None])
    valid = (yv[:, :, :, None, None] & xv[:, None, None, :, :])[..., None]
    acc = jnp.where(valid, acc, 0.0)
    # average over the n x n samples (invalid points count in the
    # denominator, matching the C++ kernel) -> [R, out, out, C]
    return acc.mean(axis=(2, 4))


# --------------------------------------------------------------------------- #
# host-side glue (numpy): anchors, box coding, NMS, level assignment
# --------------------------------------------------------------------------- #
def cell_anchors(sizes=ANCHOR_SIZES, ratios=ANCHOR_RATIOS) -> List[np.ndarray]:
    """torchvision AnchorGenerator.generate_anchors per level (rounded)."""
    out = []
    for s in sizes:
        h_r = np.sqrt(np.asarray(ratios, np.float32))
        w_r = 1.0 / h_r
        ws = (w_r * s)[:, None]
        hs = (h_r * s)[:, None]
        base = np.concatenate([-ws, -hs, ws, hs], axis=1) / 2.0
        out.append(np.round(base))
    return out


def grid_anchors(feat_hw: Sequence[Tuple[int, int]],
                 padded_hw: Tuple[int, int]) -> List[np.ndarray]:
    """Anchors per level, ordered (y, x, cell-anchor) to match the head's
    permute_and_flatten layout (torchvision rpn.py:permute_and_flatten).
    Strides divide the PADDED batch size (a stride-32 multiple), exactly
    as AnchorGenerator computes them from images.tensors."""
    cells = cell_anchors()
    out = []
    for (fh, fw), cell in zip(feat_hw, cells):
        stride_y = padded_hw[0] // fh
        stride_x = padded_hw[1] // fw
        sx = np.arange(fw, dtype=np.float32) * stride_x
        sy = np.arange(fh, dtype=np.float32) * stride_y
        shift_x, shift_y = np.meshgrid(sx, sy)  # [fh, fw]
        shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                          axis=-1).reshape(-1, 1, 4)
        out.append((shifts + cell[None]).reshape(-1, 4))
    return out


def decode_boxes(deltas: np.ndarray, boxes: np.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> np.ndarray:
    """torchvision BoxCoder.decode_single."""
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = np.minimum(deltas[:, 2::4] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[:, 3::4] / wh, BBOX_XFORM_CLIP)
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]
    out = np.empty_like(deltas)
    out[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    out[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    out[:, 2::4] = pred_ctr_x + 0.5 * pred_w
    out[:, 3::4] = pred_ctr_y + 0.5 * pred_h
    return out


def clip_boxes(boxes: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    boxes = boxes.copy()
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, hw[1])
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, hw[0])
    return boxes


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float
        ) -> np.ndarray:
    """Greedy NMS, descending score; returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def batched_nms(boxes, scores, idxs, iou_thresh):
    """Category-offset trick, exactly torchvision ops.boxes.batched_nms."""
    if len(boxes) == 0:
        return np.empty((0,), np.int64)
    max_coord = boxes.max()
    offsets = idxs.astype(np.float32) * (max_coord + 1)
    return nms(boxes + offsets[:, None], scores, iou_thresh)


def _remove_small(boxes, min_size):
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    return (ws >= min_size) & (hs >= min_size)


# --------------------------------------------------------------------------- #
# full detector
# --------------------------------------------------------------------------- #
class MaskRCNNDetector:
    """Inference-only detector with the torchvision decision pipeline.

    ``detect(image)`` takes one uint8/float HWC RGB image (values 0..255
    or 0..1) and returns {"boxes", "labels", "scores"} sorted by
    descending score, like torchvision's output dicts.  ``resize=False``
    skips the min-800/max-1333 resize (used by parity tests to avoid
    comparing interpolators)."""

    def __init__(self, params, min_size: int = 800, max_size: int = 1333):
        self.params = params
        self.min_size = min_size
        self.max_size = max_size
        self._backbone = jax.jit(lambda p, x: backbone_fpn(p, x))
        self._rpn = jax.jit(lambda p, f: rpn_head(p, f))
        self._box = jax.jit(lambda p, x: box_head(p, x))
        self._roi = jax.jit(roi_align, static_argnums=(2, 3, 4))

    # ---- torchvision GeneralizedRCNNTransform ---------------------------- #
    def _preprocess(self, image: np.ndarray, resize: bool):
        if np.issubdtype(np.asarray(image).dtype, np.integer):
            # uint8 frames -> [0, 1]; a value-range heuristic would treat
            # near-black integer frames (max <= 1) as already-normalized
            img = np.asarray(image, np.float32) / 255.0
        else:
            img = np.asarray(image, np.float32)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        orig_hw = img.shape[:2]
        if resize:
            h, w = orig_hw
            scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
            # floor sizing: F.interpolate(scale_factor=...,
            # recompute_scale_factor=True) produces floor(in * scale)
            nh, nw = int(h * scale), int(w * scale)
            # antialias=False: torchvision's GeneralizedRCNNTransform uses
            # F.interpolate(mode="bilinear", antialias=False); jax defaults
            # antialias=True, which applies a low-pass filter on downscale
            # and would shift detection scores on >800px video frames
            img = np.asarray(jax.image.resize(
                jnp.asarray(img), (nh, nw, 3), method="linear",
                antialias=False))
        # pad to stride-32 multiples (batch of one)
        h, w = img.shape[:2]
        ph = -(-h // 32) * 32
        pw = -(-w // 32) * 32
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:h, :w] = img
        return padded, (h, w), orig_hw

    def _proposals(self, levels, image_hw, padded_hw):
        """torchvision RegionProposalNetwork.filter_proposals."""
        feat_hw = [(o.shape[1], o.shape[2]) for o, _ in levels]
        anchors = grid_anchors(feat_hw, padded_hw)
        all_boxes, all_scores, all_lvl = [], [], []
        for lvl, ((obj, deltas), anc) in enumerate(zip(levels, anchors)):
            # [1, H, W, A] -> (y, x, anchor) flatten — NHWC already matches
            # permute_and_flatten's (N, H, W, A, C) ordering
            obj = np.asarray(obj)[0].reshape(-1)
            dl = np.asarray(deltas)[0].reshape(-1, 4)
            k = min(RPN_PRE_NMS_TOP_N, obj.shape[0])
            top = np.argpartition(-obj, k - 1)[:k]
            top = top[np.argsort(-obj[top], kind="stable")]
            boxes = decode_boxes(dl[top], anc[top]).reshape(-1, 4)
            all_boxes.append(boxes)
            all_scores.append(obj[top])
            all_lvl.append(np.full(k, lvl, np.int64))
        boxes = np.concatenate(all_boxes)
        scores = 1.0 / (1.0 + np.exp(-np.concatenate(all_scores)))
        lvls = np.concatenate(all_lvl)
        boxes = clip_boxes(boxes, image_hw)
        keep = _remove_small(boxes, RPN_MIN_SIZE) & (scores >= RPN_SCORE_THRESH)
        boxes, scores, lvls = boxes[keep], scores[keep], lvls[keep]
        keep = batched_nms(boxes, scores, lvls, RPN_NMS_THRESH)
        keep = keep[:RPN_POST_NMS_TOP_N]
        return boxes[keep]

    def _pool(self, feats, proposals, image_hw):
        """MultiScaleRoIAlign over P2..P5 with the canonical level mapper
        (torchvision ops/poolers.py: k0=4, canonical 224, clamp [2, 5])."""
        areas = ((proposals[:, 2] - proposals[:, 0])
                 * (proposals[:, 3] - proposals[:, 1]))
        k = np.floor(4 + np.log2(np.sqrt(np.maximum(areas, 0)) / 224 + 1e-6))
        k = np.clip(k, 2, 5).astype(np.int64) - 2
        pooled = np.zeros((len(proposals), 7, 7, 256), np.float32)
        for lvl in range(4):
            sel = np.nonzero(k == lvl)[0]
            if not len(sel):
                continue
            # pad the roi count to a power of two so the jitted roi_align
            # compiles O(log max_rois) variants, not one per frame
            n_pad = max(8, 1 << int(np.ceil(np.log2(len(sel)))))
            rois = np.zeros((n_pad, 4), np.float32)
            rois[: len(sel)] = proposals[sel]
            out = self._roi(feats[lvl][0], jnp.asarray(rois),
                            1.0 / FPN_STRIDES[lvl], 7, 2)
            pooled[sel] = np.asarray(out)[: len(sel)]
        return pooled

    def detect(self, image: np.ndarray, resize: bool = True) -> Dict:
        img, image_hw, orig_hw = self._preprocess(image, resize)
        feats = self._backbone(self.params, jnp.asarray(img)[None])
        levels = self._rpn(self.params, feats)
        proposals = self._proposals(levels, image_hw, img.shape[:2])
        if len(proposals) == 0:
            return {"boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int64),
                    "scores": np.zeros((0,), np.float32)}
        pooled = self._pool(feats, proposals, image_hw)
        cls_logits, box_deltas = self._box(self.params, jnp.asarray(pooled))
        cls_logits = np.asarray(cls_logits)
        box_deltas = np.asarray(box_deltas)

        # torchvision RoIHeads.postprocess_detections
        scores = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
        scores = scores / scores.sum(-1, keepdims=True)
        boxes = decode_boxes(box_deltas, proposals,
                             weights=(10.0, 10.0, 5.0, 5.0))
        boxes = boxes.reshape(-1, NUM_CLASSES, 4)
        boxes = clip_boxes(boxes.reshape(-1, 4), image_hw).reshape(
            -1, NUM_CLASSES, 4)

        out_boxes, out_scores, out_labels = [], [], []
        for c in range(1, NUM_CLASSES):  # skip background
            sc = scores[:, c]
            sel = sc > BOX_SCORE_THRESH
            bx = boxes[sel, c]
            sc = sc[sel]
            ok = _remove_small(bx, 1e-2)
            bx, sc = bx[ok], sc[ok]
            out_boxes.append(bx)
            out_scores.append(sc)
            out_labels.append(np.full(len(sc), c, np.int64))
        boxes = np.concatenate(out_boxes) if out_boxes else \
            np.zeros((0, 4), np.float32)
        scores = np.concatenate(out_scores) if out_scores else \
            np.zeros((0,), np.float32)
        labels = np.concatenate(out_labels) if out_labels else \
            np.zeros((0,), np.int64)
        keep = batched_nms(boxes, scores, labels, BOX_NMS_THRESH)
        keep = keep[:DETECTIONS_PER_IMG]
        boxes = boxes[keep].astype(np.float32)
        if image_hw != orig_hw:
            # transform.postprocess: boxes back to ORIGINAL image coords
            boxes = boxes * np.asarray(
                [orig_hw[1] / image_hw[1], orig_hw[0] / image_hw[0]] * 2,
                np.float32)
        return {"boxes": boxes,
                "labels": labels[keep],
                "scores": scores[keep].astype(np.float32)}

    def classify_person(self, image: np.ndarray, resize: bool = True) -> bool:
        """Reference ``classify_person``
        (filter_outdoor_maskrcnn_coco.py:116-120): person among the top-5
        detections."""
        det = self.detect(image, resize=resize)
        return PERSON_LABEL in det["labels"][:5]


def person_flags_for_frames(detector: MaskRCNNDetector,
                            frames: Sequence[np.ndarray]) -> List[bool]:
    """Batch driver for pipeline/filters.py:filter_frames person_flags."""
    return [detector.classify_person(f) for f in frames]
