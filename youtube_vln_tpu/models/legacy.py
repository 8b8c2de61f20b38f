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

# hard-coded in the reference ctors (BertPreTrainingHeads nn.Dropout(0.1),
# vilbert.py:937; VILBertForVLTasks dropout_prob=0.1, :1458-1463;
# SimpleClassifier's internal Dropout is 0.5, :1466)
_HEAD_DROPOUT = 0.1
_CLASSIFIER_DROPOUT = 0.5


def init_weight_norm_linear(key, in_dim: int, out_dim: int,
                            std: float = 0.02) -> Dict:
    """torch ``weight_norm(nn.Linear(...), dim=None)``: weight = g * v/|v|
    with a SCALAR g over the whole matrix; at init g = |w| so the layer
    equals the plain linear it wraps."""
    lin = L.init_linear(key, in_dim, out_dim, std)
    return {"v": lin["w"],
            "g": jnp.linalg.norm(lin["w"]).astype(jnp.float32),
            "b": lin["b"]}


def weight_norm_linear(x, p: Dict):
    w = p["g"] * p["v"] / jnp.linalg.norm(p["v"])
    return x @ w + p["b"]


def init_simple_classifier(key, in_dim: int, hid_dim: int, out_dim: int,
                           std: float = 0.02) -> Dict:
    """reference SimpleClassifier (vilbert.py:1522-1535):
    weight_norm(Linear) -> ReLU -> Dropout(0.5) -> weight_norm(Linear).
    (An earlier version implemented Linear->GELU->LayerNorm->Linear —
    a different head than the one its citation names.)"""
    k1, k2 = jax.random.split(key)
    return {
        "dense1": init_weight_norm_linear(k1, in_dim, hid_dim, std),
        "dense2": init_weight_norm_linear(k2, hid_dim, out_dim, std),
    }


def simple_classifier(x, p: Dict, *, rng=None, train: bool = False):
    h = jax.nn.relu(weight_norm_linear(x, p["dense1"]))
    h = L.dropout(h, _CLASSIFIER_DROPOUT, rng, train)
    return weight_norm_linear(h, p["dense2"])


def multimodal_pretraining_forward(params, cfg: LilyConfig, instr_tokens,
                                   image_features, image_locations,
                                   token_type_ids=None, attention_mask=None,
                                   image_attention_mask=None, *, rng=None,
                                   train=False):
    """reference BertForMultiModalPreTraining.forward (vilbert.py:1373-1455):
    MLM + masked-vision + 2-way seq-relationship over the fused pool.
    The fused pool passes through the heads' hard-coded Dropout(0.1)
    before the seq-relationship linear (vilbert.py:937,944-947)."""
    if rng is not None:
        rng, head_rng = jax.random.split(rng)
    else:
        head_rng = None
    seq_t, seq_v, pooled_t, pooled_v = bert_model(
        params, cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask, rng=rng,
        train=train)
    pooled = L.dropout(fuse_pooled(cfg, pooled_t, pooled_v),
                       _HEAD_DROPOUT, head_rng, train)
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
    through self.dropout(0.1) then the SimpleClassifier head (which adds
    its own internal Dropout(0.5)) — e.g. VQA-style prediction."""
    if rng is not None:
        rng, head_rng, cls_rng = jax.random.split(rng, 3)
    else:
        head_rng = cls_rng = None
    _, _, pooled_t, pooled_v = bert_model(
        params, cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask, rng=rng,
        train=train)
    pooled = L.dropout(fuse_pooled(cfg, pooled_t, pooled_v),
                       _HEAD_DROPOUT, head_rng, train)
    return simple_classifier(pooled, classifier_params, rng=cls_rng,
                             train=train).astype(jnp.float32)
