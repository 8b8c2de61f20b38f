"""Step 5a: WideResNet-18 Places365 indoor classifier, TPU-native.

The reference vendors a modified torchvision ResNet
(``scripts/video_process/wideresnet.py:1-219``: no maxpool after conv1,
14x14 final feature map, AvgPool2d(14)) and drives it in
``filter_outdoor_resnet_place365.py:100-269``: per frame it produces the
scene-category top-k, scene attributes from a linear probe on the pooled
feature (the ``avgpool`` forward hook), and the indoor/outdoor vote
``mean(labels_IO[top10]) < 0.5``.

This is the JAX re-implementation: a pure function over a parameter pytree,
NHWC layout (TPU conv-friendly), inference-mode BatchNorm folded to a
scale/bias at apply time, and a jittable batched scorer that returns
logits + the two hooked features in one pass (no hooks needed).  Torch
checkpoints (``wideresnet18_places365.pth.tar``) import via
``params_from_torch_state_dict``.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torch nn.BatchNorm2d default

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# --------------------------------------------------------------------------- #
# parameters
# --------------------------------------------------------------------------- #
def _init_conv(key, kh, kw, cin, cout):
    # reference init: N(0, sqrt(2/n)), n = kh*kw*cout (wideresnet.py:115-117)
    n = kh * kw * cout
    return math.sqrt(2.0 / n) * jax.random.normal(
        key, (kh, kw, cin, cout), jnp.float32)


def _init_bn(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_places_params(key, num_classes: int = 365,
                       blocks: Sequence[int] = (2, 2, 2, 2)) -> Dict:
    keys = iter(jax.random.split(key, 64))
    params: Dict = {
        "conv1": _init_conv(next(keys), 7, 7, 3, 64),
        "bn1": _init_bn(64),
    }
    cin = 64
    for li, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
        layer = []
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            blk = {
                "conv1": _init_conv(next(keys), 3, 3, cin, planes),
                "bn1": _init_bn(planes),
                "conv2": _init_conv(next(keys), 3, 3, planes, planes),
                "bn2": _init_bn(planes),
            }
            if stride != 1 or cin != planes:
                blk["downsample"] = {
                    "conv": _init_conv(next(keys), 1, 1, cin, planes),
                    "bn": _init_bn(planes),
                }
            layer.append(blk)
            cin = planes
        params[f"layer{li + 1}"] = layer
    params["fc"] = {
        "w": 0.01 * jax.random.normal(next(keys), (512, num_classes),
                                      jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params


def params_from_torch_state_dict(state_dict: Dict) -> Dict:
    """Map the reference torch layout (``module.``-prefix tolerated, OIHW
    convs) onto our pytree (HWIO, NHWC)."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    def conv(name):
        return jnp.asarray(sd[name].transpose(2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"]),
                "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                "var": jnp.asarray(sd[f"{prefix}.running_var"])}

    params: Dict = {"conv1": conv("conv1.weight"), "bn1": bn("bn1")}
    for li in range(1, 5):
        layer = []
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            p = f"layer{li}.{bi}"
            blk = {"conv1": conv(f"{p}.conv1.weight"), "bn1": bn(f"{p}.bn1"),
                   "conv2": conv(f"{p}.conv2.weight"), "bn2": bn(f"{p}.bn2")}
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(f"{p}.downsample.0.weight"),
                    "bn": bn(f"{p}.downsample.1")}
            layer.append(blk)
            bi += 1
        params[f"layer{li}"] = layer
    params["fc"] = {"w": jnp.asarray(sd["fc.weight"].T),
                    "b": jnp.asarray(sd["fc.bias"])}
    return params


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _conv(x, w, stride: int, padding: int):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    # inference-mode BN folded to one scale/bias (running statistics)
    inv = jax.lax.rsqrt(p["var"] + BN_EPS) * p["scale"]
    return x * inv.astype(x.dtype) + (p["bias"] - p["mean"] * inv).astype(x.dtype)


def _basic_block(x, p, stride: int):
    r = x
    h = jax.nn.relu(_bn(_conv(x, p["conv1"], stride, 1), p["bn1"]))
    h = _bn(_conv(h, p["conv2"], 1, 1), p["bn2"])
    if "downsample" in p:
        r = _bn(_conv(x, p["downsample"]["conv"], stride, 0),
                p["downsample"]["bn"])
    return jax.nn.relu(h + r)


def places_forward(params, images) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """images: [N, H, W, 3] float32 (normalized).  Returns
    (logits [N, C], layer4 feature map [N, h, w, 512], pooled [N, 512]) —
    the same three tensors the reference reads via forward + Hooker on
    ("layer4", "avgpool") (filter_outdoor_resnet_place365.py:113-127)."""
    x = jax.nn.relu(_bn(_conv(images, params["conv1"], 2, 3), params["bn1"]))
    # NOTE: no maxpool — the vendored variant comments it out
    # (wideresnet.py:105)
    for li in range(1, 5):
        for bi, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _basic_block(x, blk, stride)
    layer4 = x
    pooled = jnp.mean(x, axis=(1, 2))          # AvgPool2d(14) at 14x14 input
    logits = pooled @ params["fc"]["w"].astype(pooled.dtype) \
        + params["fc"]["b"].astype(pooled.dtype)
    return logits, layer4, pooled


def resnet18_backbone_forward(params, images, *, maxpool: bool = True
                              ) -> jnp.ndarray:
    """Standard (torchvision-layout) ResNet-18 trunk up to layer4 — the
    frozen pair encoder of the inverse-action model
    (``scripts/inverse_action/inverse_model.py:36-44``: children()[:-2],
    [N, 512, 7, 7] at 224 input).  Same parameter pytree as
    ``init_places_params``/``params_from_torch_state_dict`` (torchvision
    resnet18 state dicts share the key layout); ``maxpool=False``
    reproduces the vendored Places365 variant's trunk instead."""
    x = jax.nn.relu(_bn(_conv(images, params["conv1"], 2, 3), params["bn1"]))
    if maxpool:
        # nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
    for li in range(1, 5):
        for bi, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _basic_block(x, blk, stride)
    return x


def preprocess_images(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """[N, H, W, 3] uint8 -> resized + ImageNet-normalized float32 (the
    reference's Resize(224)/ToTensor/Normalize transform,
    filter_outdoor_resnet_place365.py:100-110)."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    n = x.shape[0]
    x = jax.image.resize(x, (n, size, size, 3), method="bilinear")
    return np.asarray((x - IMAGENET_MEAN) / IMAGENET_STD, np.float32)


# --------------------------------------------------------------------------- #
# AlexNet-Places365 (step 5b's indoor scorer)
# --------------------------------------------------------------------------- #
# The person-filter driver (filter_outdoor_maskrcnn_coco.py:49-66) loads
# ``alexnet_places365.pth.tar`` into torchvision's AlexNet(num_classes=365)
# and scores frames with ``classify_indoors`` (:129-138).  This is that
# model as a pure JAX function (NHWC), with the torchvision parameter
# layout (features.{0,3,6,8,10} convs, classifier.{1,4,6} linears).

_ALEXNET_CONVS = (  # (kh, cin, cout, stride, pad, maxpool_after)
    (11, 3, 64, 4, 2, True),
    (5, 64, 192, 1, 2, True),
    (3, 192, 384, 1, 1, False),
    (3, 384, 256, 1, 1, False),
    (3, 256, 256, 1, 1, True),
)


def init_alexnet_params(key, num_classes: int = 365) -> Dict:
    keys = iter(jax.random.split(key, 16))
    params: Dict = {"features": [], "classifier": []}
    for kh, cin, cout, _, _, _ in _ALEXNET_CONVS:
        params["features"].append({
            "w": _init_conv(next(keys), kh, kh, cin, cout),
            "b": jnp.zeros((cout,), jnp.float32)})
    for d_in, d_out in ((256 * 6 * 6, 4096), (4096, 4096),
                        (4096, num_classes)):
        params["classifier"].append({
            "w": 0.01 * jax.random.normal(next(keys), (d_in, d_out),
                                          jnp.float32),
            "b": jnp.zeros((d_out,), jnp.float32)})
    return params


def alexnet_params_from_torch_state_dict(state_dict: Dict) -> Dict:
    """torchvision AlexNet layout -> our pytree.  The places365 checkpoint
    wraps keys in ``module.`` (DataParallel) — tolerated like the
    WideResNet import.  The first linear consumes the torch CHW-flattened
    [256,6,6] pooled map; our forward flattens NHWC, so its rows are
    permuted to match."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)

    feats = []
    for i in (0, 3, 6, 8, 10):
        feats.append({"w": jnp.asarray(
            sd[f"features.{i}.weight"].transpose(2, 3, 1, 0)),
            "b": jnp.asarray(sd[f"features.{i}.bias"])})
    cls = []
    for j, i in enumerate((1, 4, 6)):
        w = sd[f"classifier.{i}.weight"].T  # [in, out]
        if j == 0:
            # torch flattens [C=256, H=6, W=6]; we flatten [H, W, C]
            w = w.reshape(256, 6, 6, -1).transpose(1, 2, 0, 3).reshape(
                256 * 6 * 6, -1)
        cls.append({"w": jnp.asarray(w),
                    "b": jnp.asarray(sd[f"classifier.{i}.bias"])})
    return {"features": feats, "classifier": cls}


def _maxpool_3x3s2(x):
    # nn.MaxPool2d(kernel_size=3, stride=2): floor mode, no padding
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])


def alexnet_forward(params, images) -> jnp.ndarray:
    """images: [N, 224, 224, 3] float32 (normalized) -> logits [N, C].

    Inference path of torchvision AlexNet: the adaptive avgpool is the
    identity at 224 input (the feature map is already 6x6) and dropout is
    eval-mode (off)."""
    x = images
    for p, (_, _, _, stride, pad, pool) in zip(params["features"],
                                               _ALEXNET_CONVS):
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + p["b"].astype(x.dtype))
        if pool:
            x = _maxpool_3x3s2(x)
    x = x.reshape(x.shape[0], -1)  # [N, 6*6*256] in HWC order
    for j, p in enumerate(params["classifier"]):
        x = x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
        if j < 2:
            x = jax.nn.relu(x)
    return x


def preprocess_images_crop(images_uint8: np.ndarray, resize: int = 256,
                           crop: int = 224) -> np.ndarray:
    """Resize(256) + CenterCrop(224) + ImageNet normalize — the person
    filter's transform (filter_outdoor_maskrcnn_coco.py:70-75).  Resize
    matches torchvision semantics (shorter side -> 256, aspect kept);
    interpolation differs from PIL at the subpixel level, which is far
    below the top-10 vote's sensitivity."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    n, h, w = x.shape[:3]
    if h < w:
        nh, nw = resize, max(crop, int(round(w * resize / h)))
    else:
        nh, nw = max(crop, int(round(h * resize / w))), resize
    x = jax.image.resize(x, (n, nh, nw, 3), method="bilinear")
    top, left = (nh - crop) // 2, (nw - crop) // 2
    x = x[:, top:top + crop, left:left + crop, :]
    return np.asarray((x - IMAGENET_MEAN) / IMAGENET_STD, np.float32)


# shared jitted instance — the per-video 5b driver calls the scorer once
# per video, and a per-call jax.jit would re-trace AlexNet every time
_alexnet_forward_jit = jax.jit(alexnet_forward)


def alexnet_indoor_probs(params, images_uint8: np.ndarray,
                         is_indoor_class: np.ndarray,
                         batch_size: int = 64, top_k: int = 10) -> np.ndarray:
    """Reference classify_indoors (filter_outdoor_maskrcnn_coco.py:129-138):
    per frame, the summed softmax probability of the indoor scene
    categories among the top-k classes.  Drop-in indoor_probs input for
    filters.filter_frames."""
    from .filters import indoor_probability

    fwd = _alexnet_forward_jit
    out: List[float] = []
    for s in range(0, len(images_uint8), batch_size):
        imgs = preprocess_images_crop(images_uint8[s:s + batch_size])
        probs = np.asarray(jax.nn.softmax(fwd(params, jnp.asarray(imgs)),
                                          axis=-1))
        out += [indoor_probability(p, is_indoor_class, top_k=top_k)
                for p in probs]
    return np.asarray(out, np.float32)


# --------------------------------------------------------------------------- #
# scoring driver (run_model equivalent)
# --------------------------------------------------------------------------- #
# one jitted instance shared by every score_batch call — a per-call
# jax.jit(places_forward) would re-trace the whole network per 64-frame
# chunk in the per-video driver loops
_places_forward_jit = jax.jit(places_forward)


def is_indoor(sorted_idx: np.ndarray, labels_io: np.ndarray
              ) -> Tuple[float, bool]:
    """Vote over the top-10 scene categories
    (filter_outdoor_resnet_place365.py:202-206)."""
    io_image = float(np.mean(labels_io[sorted_idx[:10]]))
    return io_image, bool(io_image < 0.5)


def score_batch(params, images, *, labels_io: np.ndarray,
                classes: Optional[Sequence[str]] = None,
                labels_attribute: Optional[Sequence[str]] = None,
                w_attribute: Optional[np.ndarray] = None,
                num_cat: int = 5, num_attr: int = 10) -> List[Dict]:
    """Reference ``run_model`` (filter_outdoor_resnet_place365.py:216-268):
    per image, scene-category top-k, attribute responses from the pooled
    feature, and the indoor vote."""
    logits, _, pooled = _places_forward_jit(params, jnp.asarray(images))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    pooled = np.asarray(pooled)

    out = []
    for i in range(probs.shape[0]):
        idx = np.argsort(-probs[i])
        det: Dict = {"is_indoor": is_indoor(idx, labels_io)}
        if classes is not None:
            det["category"] = [(float(probs[i, idx[j]]), classes[idx[j]])
                               for j in range(num_cat)]
        if w_attribute is not None and labels_attribute is not None:
            resp = w_attribute.dot(pooled[i])
            resp = np.exp(resp - resp.max())
            resp /= resp.sum()
            idx_a = np.argsort(resp)
            det["attributes"] = [
                (float(resp[idx_a[j]]), labels_attribute[idx_a[j]])
                for j in range(-1, -num_attr, -1)]
        out.append(det)
    return out


def indoor_scores(params, images_uint8: np.ndarray, labels_io: np.ndarray,
                  batch_size: int = 64) -> np.ndarray:
    """P(indoor)-style score per frame: 1 - mean(labels_IO[top10]).

    Drop-in input for filters.indoor_filter (threshold 0.5 reproduces the
    reference's `io_image < 0.5` vote exactly)."""
    scores = []
    for s in range(0, len(images_uint8), batch_size):
        imgs = preprocess_images(images_uint8[s:s + batch_size])
        for det in score_batch(params, imgs, labels_io=labels_io):
            io_image, _ = det["is_indoor"]
            scores.append(1.0 - io_image)
    return np.asarray(scores, np.float32)
