"""Step 7-8: inverse action model + per-video action profiles (JAX).

The reference trains a small classifier over frozen ResNet-18 feature maps
of consecutive frame pairs to predict the camera action between them —
{forward, left, right} (``scripts/inverse_action/inverse_model.py:34-88``:
concat [B,1024,7,7] -> 1x1 conv 256 -> 3x3 conv 256 -> 3x3 conv 64 ->
fc 128 -> fc 3), trained on Gibson/Habitat trajectories.

Here the head is a pure-JAX model over pluggable backbone feature maps
([7,7,512] per frame; any frozen encoder works), trained with the same
topology; profiles are written as JSON (the reference's feather file is a
pandas detail, ``genearate_Profiles.py``).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ACTIONS = ("forward", "left", "right")
ACTION_MAP = {0: "forward", 1: "left", 2: "right"}


def init_inverse_params(key, feat_channels: int = 512) -> Dict:
    std = 0.05
    ks = jax.random.split(key, 5)
    c_in = 2 * feat_channels

    def conv(k, kh, kw, cin, cout):
        return {"w": std * jax.random.normal(k, (kh, kw, cin, cout),
                                             jnp.float32),
                "b": jnp.zeros((cout,), jnp.float32)}

    return {
        "conv1": conv(ks[0], 1, 1, c_in, 256),
        "conv2": conv(ks[1], 3, 3, 256, 256),
        "conv3": conv(ks[2], 3, 3, 256, 64),
        "fc1": {"w": std * jax.random.normal(ks[3], (64 * 3 * 3, 128)),
                "b": jnp.zeros((128,))},
        "fc2": {"w": std * jax.random.normal(ks[4], (128, 3)),
                "b": jnp.zeros((3,))},
    }


def _conv(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def inverse_forward(params, feat_k, feat_k1, *, train=False, rng=None):
    """feat_k/feat_k1: [B, 7, 7, C] backbone maps -> [B, 3] logits."""
    x = jnp.concatenate([feat_k, feat_k1], axis=-1)
    x = jax.nn.relu(_conv(x, params["conv1"]))          # [B,7,7,256]
    x = jax.nn.relu(_conv(x, params["conv2"]))          # [B,5,5,256]
    x = jax.nn.relu(_conv(x, params["conv3"]))          # [B,3,3,64]
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    # Dropout(0.5) sits AFTER fc1's ReLU on the 128-d vector, exactly as
    # in the reference (inverse_model.py:70-82) — an earlier version
    # regularized the conv2 map instead, which trains a different head
    if train and rng is not None:
        x = jnp.where(jax.random.bernoulli(rng, 0.5, x.shape), x / 0.5, 0.0)
    return x @ params["fc2"]["w"] + params["fc2"]["b"]


def train_inverse_model(pairs: Iterator[Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]],
                        *, steps: int = 100, lr: float = 1e-3,
                        feat_channels: int = 512, seed: int = 0):
    """Train the head on (feat_k, feat_k1, action) batches.  Returns
    (params, losses)."""
    import optax

    params = init_inverse_params(jax.random.PRNGKey(seed), feat_channels)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, fk, fk1, y, rng):
        def loss_fn(p):
            logits = inverse_forward(p, fk, fk1, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 1)
    losses = []
    for i, (fk, fk1, y) in zip(range(steps), pairs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(fk), jnp.asarray(fk1),
                                       jnp.asarray(y), sub)
        losses.append(loss)  # device values; forced once at the end
    return params, [float(x) for x in losses]


def encode_frames(backbone_params, images_uint8: np.ndarray,
                  batch_size: int = 64) -> np.ndarray:
    """Frozen ResNet-18 pair-encoder features from raw frames
    (reference inverse_model.py:36-44 + util/torch.py imageNetTransformPIL):
    [N, H, W, 3] uint8 -> [N, 7, 7, 512] float32 at 224 input.

    imageNetTransformPIL is Resize(224) on the SHORTER side + CenterCrop
    (224) — NOT a full-frame squash (that is the Places365 filter's own
    Resize((224,224)) transform; an earlier version reused it here and
    fed the backbone aspect-distorted frames)."""
    from .places365 import preprocess_images_crop

    chunks = []
    for s in range(0, len(images_uint8), batch_size):
        px = preprocess_images_crop(images_uint8[s:s + batch_size],
                                    resize=224, crop=224)
        chunks.append(np.asarray(
            _resnet18_backbone_jit(backbone_params, jnp.asarray(px)),
            np.float32))
    return np.concatenate(chunks, axis=0)


def image_pair_batches(images_uint8: np.ndarray, actions: np.ndarray,
                       backbone_params, *, batch_size: int = 32,
                       seed: int = 0) -> Iterator[Tuple[np.ndarray,
                                                        np.ndarray,
                                                        np.ndarray]]:
    """(frame_k, frame_k+1, action) batches from raw frames through the
    frozen backbone — the Gibson/Habitat training plumbing equivalent
    (reference image_streams.py feeds PIL pairs the same way).  ``actions``
    labels the transition images[i] -> images[i+1]."""
    feats = encode_frames(backbone_params, images_uint8)
    fk, fk1 = feats[:-1], feats[1:]
    y = np.asarray(actions, np.int32)
    assert len(y) == len(fk)
    rng = np.random.default_rng(seed)
    while True:
        sel = rng.integers(0, len(fk), size=batch_size)
        yield fk[sel], fk1[sel], y[sel]


def train_inverse_model_from_images(images_uint8: np.ndarray,
                                    actions: np.ndarray, backbone_params,
                                    **train_kw):
    """Step 7 end-to-end from frames: frozen ResNet-18 features + the conv
    head (inverse_model.py:47-88)."""
    batches = image_pair_batches(images_uint8, actions, backbone_params,
                                 seed=train_kw.get("seed", 0))
    return train_inverse_model(batches, **train_kw)


_inverse_forward_jit = jax.jit(lambda p, a, b: inverse_forward(p, a, b))
# shared jitted backbone — encode_frames runs once per video in the
# profile driver; a per-call jax.jit would re-trace ResNet-18 every time
def _backbone(params, px):
    from .places365 import resnet18_backbone_forward
    return resnet18_backbone_forward(params, px)


_resnet18_backbone_jit = jax.jit(_backbone)


def predict_actions(params, feats: Sequence[np.ndarray]) -> List[str]:
    """Actions between consecutive frames: len(feats)-1 predictions."""
    if len(feats) < 2:
        return []
    fk = jnp.stack(feats[:-1])
    fk1 = jnp.stack(feats[1:])
    # shared jitted instance: predict_actions runs once per VIDEO in the
    # profile driver, and a fresh jax.jit would re-trace every time
    logits = _inverse_forward_jit(params, fk, fk1)
    return [ACTION_MAP[int(i)] for i in np.asarray(jnp.argmax(logits, -1))]


def write_action_profiles(out_dir, video_id: str,
                          trajectories: Dict[str, List[int]],
                          actions_by_frame: Dict[int, str],
                          captions: Dict[str, List[str]]) -> Path:
    """Per-video profile artifacts (reference genearate_Profiles.py:40-62):
    ``inverses_actions.json`` — one {frame_id: [action]} dict per
    trajectory, actions for all but the last frame — and
    ``captions_pro.json`` — one {frame_id: caption} dict per trajectory,
    INCLUDING the last frame (the reference writes both side by side;
    this used to accept ``captions`` and silently discard it).  Returns
    the inverses_actions.json path."""
    profiles, cap_profiles = [], []
    for _, frames in trajectories.items():
        per, cap_per = {}, {}
        for fid in frames[:-1]:
            per[str(fid)] = [actions_by_frame[fid]]
        for fid in frames:
            cap_per[str(fid)] = captions["%04d.jpg" % fid][0]
        profiles.append(per)
        cap_profiles.append(cap_per)
    d = Path(out_dir) / video_id
    d.mkdir(parents=True, exist_ok=True)
    path = d / "inverses_actions.json"
    with open(path, "w") as f:
        json.dump(profiles, f)
    with open(d / "captions_pro.json", "w") as f:
        json.dump(cap_profiles, f)
    return path
