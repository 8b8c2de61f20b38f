"""Legacy ViLBERT task heads carried by the reference but unused by its
entry points (reference ``vilbert/vilbert.py:1373-1535``; SURVEY §2.1
"Legacy task models").  Provided for API completeness so downstream users of
the original classes have TPU equivalents.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import LilyConfig
from . import layers as L
from .vilbert import bert_model, fuse_pooled, image_head, mlm_head


def init_simple_classifier(key, in_dim: int, hid_dim: int, out_dim: int,
                           std: float = 0.02) -> Dict:
    """reference SimpleClassifier (vilbert.py:1522-1535): Linear -> GELU ->
    LayerNorm -> Linear."""
    k1, k2 = jax.random.split(key)
    return {
        "dense1": L.init_linear(k1, in_dim, hid_dim, std),
        "ln": L.init_layer_norm(hid_dim),
        "dense2": L.init_linear(k2, hid_dim, out_dim, std),
    }


def simple_classifier(x, p: Dict):
    h = L.gelu(L.linear(x, p["dense1"]))
    h = L.layer_norm(h, p["ln"])
    return L.linear(h, p["dense2"])


def multimodal_pretraining_forward(params, cfg: LilyConfig, instr_tokens,
                                   image_features, image_locations,
                                   token_type_ids=None, attention_mask=None,
                                   image_attention_mask=None, *, rng=None,
                                   train=False):
    """reference BertForMultiModalPreTraining.forward (vilbert.py:1373-1455):
    MLM + masked-vision + 2-way seq-relationship over the fused pool."""
    seq_t, seq_v, pooled_t, pooled_v = bert_model(
        params, cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask, rng=rng,
        train=train)
    pooled = fuse_pooled(cfg, pooled_t, pooled_v)
    lm = mlm_head(params["cls"], params["text_embed"]["word"], cfg, seq_t)
    vision = image_head(params["cls"]["img_head"], cfg, seq_v)
    seq_rel = L.linear(pooled, params["cls"]["seq_rel"])
    return (lm.astype(jnp.float32), vision.astype(jnp.float32),
            seq_rel.astype(jnp.float32))


def vl_tasks_forward(params, cfg: LilyConfig, classifier_params, instr_tokens,
                     image_features, image_locations, token_type_ids=None,
                     attention_mask=None, image_attention_mask=None, *,
                     rng=None, train=False):
    """reference VILBertForVLTasks (vilbert.py:1457-1520): pooled fusion
    through a SimpleClassifier head (e.g. VQA-style prediction)."""
    _, _, pooled_t, pooled_v = bert_model(
        params, cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask, rng=rng,
        train=train)
    pooled = fuse_pooled(cfg, pooled_t, pooled_v)
    return simple_classifier(pooled, classifier_params).astype(jnp.float32)
