"""Step 6 backbone: CLIP image/text encoders (ViT-B/32), TPU-native.

The reference calls OpenAI ``clip.load("ViT-B/32")`` for frame features
(``scripts/video_process/precomute_CLIP_features.py:70-100``) and prompt
embeddings (``generate_CLIP_captions.py:34-40``).  This is the JAX
re-implementation: pure functions over a parameter pytree, NHWC pixels,
pre-LN transformer blocks with quickGELU, causal text attention, eot-token
pooling, and the two output projections — the exact ``encode_image`` /
``encode_text`` surface.

Weights import from a HuggingFace ``CLIPModel`` state dict
(``params_from_hf_state_dict``; offline-gated — pass a local
``pytorch_model.bin``/safetensors path to ``load_clip_params``).  The BPE
tokenizer is likewise gated: ``tokenize_prompts`` uses a local HF tokenizer
directory when available; the encoders themselves take plain token-id
arrays.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5


@dataclass(frozen=True)  # hashable: used as a static jit argument below
class ClipConfig:
    # ViT-B/32 defaults (openai/clip-vit-base-patch32)
    image_size: int = 224
    patch_size: int = 32
    v_hidden: int = 768
    v_layers: int = 12
    v_heads: int = 12
    t_hidden: int = 512
    t_layers: int = 12
    t_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    proj_dim: int = 512

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


# --------------------------------------------------------------------------- #
# params
# --------------------------------------------------------------------------- #
def _linear(key, d_in, d_out, std=0.02):
    kw, _ = jax.random.split(key)
    return {"w": std * jax.random.normal(kw, (d_in, d_out), jnp.float32),
            "b": jnp.zeros((d_out,), jnp.float32)}


def _ln(d):
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _block(key, hidden):
    ks = iter(jax.random.split(key, 6))
    return {
        "ln1": _ln(hidden),
        "q": _linear(next(ks), hidden, hidden),
        "k": _linear(next(ks), hidden, hidden),
        "v": _linear(next(ks), hidden, hidden),
        "out": _linear(next(ks), hidden, hidden),
        "ln2": _ln(hidden),
        "fc1": _linear(next(ks), hidden, hidden * 4),
        "fc2": _linear(next(ks), hidden * 4, hidden),
    }


def init_clip_params(key, cfg: ClipConfig) -> Dict:
    ks = iter(jax.random.split(key, 16))
    params = {
        "visual": {
            "cls": 0.02 * jax.random.normal(next(ks), (cfg.v_hidden,),
                                            jnp.float32),
            # patch conv kernel, HWIO (bias-free, like HF patch_embedding)
            "patch": 0.02 * jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, cfg.v_hidden),
                jnp.float32),
            "pos": 0.02 * jax.random.normal(
                next(ks), (cfg.num_patches + 1, cfg.v_hidden), jnp.float32),
            "ln_pre": _ln(cfg.v_hidden),
            "blocks": [_block(k, cfg.v_hidden)
                       for k in jax.random.split(next(ks), cfg.v_layers)],
            "ln_post": _ln(cfg.v_hidden),
            "proj": 0.02 * jax.random.normal(
                next(ks), (cfg.v_hidden, cfg.proj_dim), jnp.float32),
        },
        "text": {
            "tok": 0.02 * jax.random.normal(
                next(ks), (cfg.vocab_size, cfg.t_hidden), jnp.float32),
            "pos": 0.02 * jax.random.normal(
                next(ks), (cfg.context_length, cfg.t_hidden), jnp.float32),
            "blocks": [_block(k, cfg.t_hidden)
                       for k in jax.random.split(next(ks), cfg.t_layers)],
            "ln_final": _ln(cfg.t_hidden),
            "proj": 0.02 * jax.random.normal(
                next(ks), (cfg.t_hidden, cfg.proj_dim), jnp.float32),
        },
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }
    return params


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _layer_norm(x, p):
    x32 = x.astype(jnp.float32)
    u = jnp.mean(x32, -1, keepdims=True)
    s = jnp.mean(jnp.square(x32 - u), -1, keepdims=True)
    return (p["w"] * (x32 - u) * jax.lax.rsqrt(s + LN_EPS)
            + p["b"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(x, p, heads: int, causal: bool):
    n, s, h = x.shape
    d = h // heads

    def split(t):
        return t.reshape(n, s, heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(_dense(x, p["q"])), split(_dense(x, p["k"])), \
        split(_dense(x, p["v"]))
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    if causal:
        mask = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, s, h)
    return _dense(ctx, p["out"])


def _transformer(x, blocks, heads: int, causal: bool):
    for p in blocks:
        x = x + _mha(_layer_norm(x, p["ln1"]), p, heads, causal)
        h = _dense(_layer_norm(x, p["ln2"]), p["fc1"])
        x = x + _dense(quick_gelu(h), p["fc2"])
    return x


def clip_image_features(params, cfg: ClipConfig, pixels) -> jnp.ndarray:
    """pixels: [N, H, W, 3] float32 (CLIP-normalized) -> [N, proj_dim].

    Equals HF ``CLIPModel.get_image_features`` / OpenAI ``encode_image``
    (unnormalized; callers L2-normalize for cosine scoring)."""
    p = params["visual"]
    x = jax.lax.conv_general_dilated(
        pixels, p["patch"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, gh, gw, h = x.shape
    x = x.reshape(n, gh * gw, h)
    cls = jnp.broadcast_to(p["cls"].astype(x.dtype), (n, 1, h))
    x = jnp.concatenate([cls, x], axis=1) + p["pos"].astype(x.dtype)
    x = _layer_norm(x, p["ln_pre"])
    x = _transformer(x, p["blocks"], cfg.v_heads, causal=False)
    pooled = _layer_norm(x[:, 0], p["ln_post"])
    return pooled @ p["proj"].astype(pooled.dtype)


def clip_text_features(params, cfg: ClipConfig, token_ids) -> jnp.ndarray:
    """token_ids: [N, S] int32 (BPE ids, eot = highest id) -> [N, proj_dim].

    Causal attention; pooled at the eot position (argmax of ids), matching
    OpenAI CLIP and HF with the standard vocab layout."""
    p = params["text"]
    n, s = token_ids.shape
    x = p["tok"][token_ids] + p["pos"][:s]
    x = _transformer(x, p["blocks"], cfg.t_heads, causal=True)
    x = _layer_norm(x, p["ln_final"])
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(n), eot]
    return pooled @ p["proj"].astype(pooled.dtype)


# --------------------------------------------------------------------------- #
# HF weight import
# --------------------------------------------------------------------------- #
def params_from_hf_state_dict(state_dict: Dict) -> Dict:
    """openai/clip-vit-base-patch32 (HF CLIPModel) layout -> our pytree."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)(), np.float32)
          for k, v in state_dict.items()}

    def lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"]),
                "b": jnp.asarray(sd[f"{prefix}.bias"])}

    def blocks(prefix, n_layers):
        out = []
        for i in range(n_layers):
            b = f"{prefix}.layers.{i}"
            out.append({
                "ln1": ln(f"{b}.layer_norm1"),
                "q": lin(f"{b}.self_attn.q_proj"),
                "k": lin(f"{b}.self_attn.k_proj"),
                "v": lin(f"{b}.self_attn.v_proj"),
                "out": lin(f"{b}.self_attn.out_proj"),
                "ln2": ln(f"{b}.layer_norm2"),
                "fc1": lin(f"{b}.mlp.fc1"),
                "fc2": lin(f"{b}.mlp.fc2"),
            })
        return out

    def count_layers(prefix):
        i = 0
        while f"{prefix}.layers.{i}.layer_norm1.weight" in sd:
            i += 1
        return i

    v_layers = count_layers("vision_model.encoder")
    t_layers = count_layers("text_model.encoder")
    return {
        "visual": {
            "cls": jnp.asarray(
                sd["vision_model.embeddings.class_embedding"].reshape(-1)),
            "patch": jnp.asarray(
                sd["vision_model.embeddings.patch_embedding.weight"]
                .transpose(2, 3, 1, 0)),           # OIHW -> HWIO
            "pos": jnp.asarray(
                sd["vision_model.embeddings.position_embedding.weight"]),
            "ln_pre": ln("vision_model.pre_layrnorm"),
            "blocks": blocks("vision_model.encoder", v_layers),
            "ln_post": ln("vision_model.post_layernorm"),
            "proj": jnp.asarray(sd["visual_projection.weight"].T),
        },
        "text": {
            "tok": jnp.asarray(
                sd["text_model.embeddings.token_embedding.weight"]),
            "pos": jnp.asarray(
                sd["text_model.embeddings.position_embedding.weight"]),
            "blocks": blocks("text_model.encoder", t_layers),
            "ln_final": ln("text_model.final_layer_norm"),
            "proj": jnp.asarray(sd["text_projection.weight"].T),
        },
        "logit_scale": jnp.asarray(sd["logit_scale"].reshape(())),
    }


def load_clip_params(path: str) -> Dict:
    """Load a local HF CLIP checkpoint (.bin via torch, .safetensors via
    safetensors).  Offline-gated: no URL fetching in this environment."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return params_from_hf_state_dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return params_from_hf_state_dict(sd)


# --------------------------------------------------------------------------- #
# preprocessing / tokenization (gated on local assets)
# --------------------------------------------------------------------------- #
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """[N, H, W, 3] uint8 -> CLIP-normalized float32 [N, size, size, 3].

    ``clip.load()``'s transform geometry: Resize(size, BICUBIC) on the
    SHORTER side + CenterCrop(size) (the reference steps 6a/6b consume
    frames through exactly that preprocess).  An earlier version squashed
    the full frame bilinearly — on a 1280x720 video frame that encodes an
    aspect-distorted full frame where the reference encodes the central
    square crop, shifting embeddings and zero-shot caption argmaxes."""
    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    n, h, w = x.shape[:3]
    if h < w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    x = jax.image.resize(x, (n, nh, nw, 3), method="bicubic")
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size, :]
    return np.asarray((x - CLIP_MEAN) / CLIP_STD, np.float32)


def tokenize_prompts(prompts: Sequence[str], tokenizer_dir: str,
                     context_length: int = 77) -> np.ndarray:
    """BPE-tokenize with a local HF CLIPTokenizer directory (vocab.json +
    merges.txt).  Raises a clear error when the assets are absent."""
    try:
        from transformers import CLIPTokenizer
        tok = CLIPTokenizer.from_pretrained(tokenizer_dir)
    except Exception as e:   # no egress: only local dirs work
        raise RuntimeError(
            f"CLIP tokenizer assets not available at {tokenizer_dir}; "
            "download vocab.json/merges.txt offline first") from e
    enc = tok(list(prompts), padding="max_length", truncation=True,
              max_length=context_length, return_tensors="np")
    return enc["input_ids"].astype(np.int32)


CLIP_TSV_FIELDNAMES = ["video_id", "frame_id", "features"]


def read_clip_tsv(path, feature_size: int = 512):
    """Reference ``read_tsv`` (precomute_CLIP_features.py:48-59):
    returns (video_ids_with_features, {"{vid}_{frame}": [1, D] f32})."""
    import base64
    import csv

    exist, feats = [], {}
    with open(path, newline="") as f:
        for item in csv.DictReader(f, delimiter="\t",
                                   fieldnames=CLIP_TSV_FIELDNAMES):
            long_id = item["video_id"] + "_" + item["frame_id"]
            feats[long_id] = np.frombuffer(
                base64.decodebytes(item["features"].encode("ascii")),
                dtype=np.float32).reshape((1, feature_size))
            exist.append(item["video_id"])
    return exist, feats


def build_clip_tsv(params, cfg: ClipConfig, frames_dir, out_path,
                   image_loader=None, batch_size: int = 64) -> int:
    """Reference ``build_tsv`` (precomute_CLIP_features.py:61-104): walk
    raw_frames/{vid}/*.jpg, encode every frame not already in the TSV
    (resume-by-append), write base64 f32 rows.  Returns rows written."""
    import base64
    import csv
    from pathlib import Path

    if image_loader is None:
        def image_loader(p):
            from PIL import Image
            return np.asarray(Image.open(p).convert("RGB"))

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out_path.exists():
        try:
            _, feats = read_clip_tsv(out_path, cfg.proj_dim)
            done = set(feats)
        except Exception:
            done = set()

    n = 0
    with open(out_path, "a", newline="") as f:
        writer = csv.DictWriter(f, delimiter="\t",
                                fieldnames=CLIP_TSV_FIELDNAMES)
        for vid_dir in sorted(Path(frames_dir).iterdir()):
            if not vid_dir.is_dir():
                continue
            frames = [p for p in sorted(vid_dir.glob("*.jpg"))
                      if f"{vid_dir.name}_{p.name}" not in done]
            if not frames:
                continue
            images = np.stack([image_loader(p) for p in frames])
            emb = encode_video_frames(params, cfg, images, batch_size)
            for p, e in zip(frames, emb):
                writer.writerow({
                    "video_id": vid_dir.name,
                    "frame_id": p.name,
                    "features": base64.b64encode(
                        e[None].astype(np.float32)).decode(),
                })
                n += 1
    return n


def encode_video_frames(params, cfg: ClipConfig, images_uint8: np.ndarray,
                        batch_size: int = 64) -> np.ndarray:
    """Frame pipeline of precomute_CLIP_features.py:70-100: preprocess +
    encode_image, float32 [N, proj_dim]."""
    chunks = []
    for s in range(0, len(images_uint8), batch_size):
        px = preprocess_images(images_uint8[s:s + batch_size],
                               cfg.image_size)
        chunks.append(np.asarray(
            _clip_image_features_jit(params, cfg, jnp.asarray(px)),
            np.float32))
    return np.concatenate(chunks, axis=0)


# shared jitted instance — the step-6 driver calls encode_video_frames
# once per VIDEO; a fresh per-call jax.jit(lambda ...) would re-trace and
# re-compile the whole ViT for every video (cfg is static: frozen
# dataclass)
_clip_image_features_jit = jax.jit(clip_image_features, static_argnums=1)
