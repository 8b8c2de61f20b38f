"""Primitive layers as pure functions over parameter pytrees.

Weight layout conventions (differ from the reference on purpose — we use the
JAX convention and convert at checkpoint-import time):
  * linear kernels are stored ``[in, out]`` (torch ``nn.Linear`` stores
    ``[out, in]``; see models/torch_io.py for the transpose discipline)
  * all math happens in ``compute_dtype`` except LayerNorm statistics and
    softmax, which stay in float32 for numerical parity.

Semantics are bit-matched to the reference:
  * TF-style LayerNorm, eps inside the sqrt, eps=1e-12
    (reference ``vilbert/vilbert.py:204-217``)
  * erf-based gelu (reference ``vilbert/vilbert.py:113-119``)
  * attention: additive mask applied to pre-softmax scores scaled by
    1/sqrt(head_dim) (reference ``vilbert/vilbert.py:284-311``)
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

LN_EPS = 1e-12


# --------------------------------------------------------------------------- #
# initializers
# --------------------------------------------------------------------------- #
def _normal(key, shape, std):
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


def init_linear(key, d_in: int, d_out: int, std: float) -> Params:
    # reference init_bert_weights: weight ~ N(0, initializer_range), bias = 0
    # (vilbert/vilbert.py:991-1002)
    return {"w": _normal(key, (d_in, d_out), std),
            "b": jnp.zeros((d_out,), jnp.float32)}


def init_embedding(key, n: int, d: int, std: float) -> jnp.ndarray:
    return _normal(key, (n, d), std)


def init_layer_norm(d: int) -> Params:
    return {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


# --------------------------------------------------------------------------- #
# forward primitives
# --------------------------------------------------------------------------- #
def gelu(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


ACT2FN = {"gelu": gelu, "relu": jax.nn.relu,
          "swish": lambda x: x * jax.nn.sigmoid(x)}


def layer_norm(x, p: Params):
    """TF-style LN in float32 regardless of compute dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    u = jnp.mean(x32, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(x32 - u), axis=-1, keepdims=True)
    y = (x32 - u) * jax.lax.rsqrt(s + LN_EPS)
    return (p["w"] * y + p["b"]).astype(dtype)


def linear(x, p: Params):
    return jnp.dot(x, p["w"].astype(x.dtype),
                   preferred_element_type=x.dtype) + p["b"].astype(x.dtype)


def dropout(x, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    # 8-bit draws quarter the RNG HBM volume vs bernoulli's f32 uniforms
    # (dropout-mask generation was ~12% of the train step).  The keep
    # probability quantizes to thresh/256 (e.g. 0.8984 for rate=0.1); we
    # scale by the EFFECTIVE keep so E[dropout(x)] == x exactly, and the
    # ~1.6e-3 shift in realized drop rate is far below run-to-run noise.
    thresh = min(round(keep * 256), 255)
    if thresh == 0:
        # rate high enough that the quantized keep probability is zero
        # (rate=1.0 in particular must zero everything, like the reference)
        return jnp.zeros_like(x)
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    mask = bits < jnp.uint8(thresh)
    return jnp.where(mask, x * (256.0 / thresh), 0.0).astype(x.dtype)


def dropout_add_ln(h, res, p_ln: Params, rate: float, rng, train: bool,
                   epilogue_fn=None):
    """LayerNorm(dropout(h) + res) — the sub-block epilogue shared by
    BertSelfOutput/BertOutput/BertBiOutput (vilbert/vilbert.py:313-337,
    355-368,620-650).  ``epilogue_fn`` (ops/epilogue.py) fuses the three
    ops into one Pallas kernel on TPU."""
    if epilogue_fn is not None:
        return epilogue_fn(h, res, p_ln, rate, rng, train)
    return layer_norm(dropout(h, rate, rng, train) + res, p_ln)


def split_heads(x, num_heads: int):
    """[B, S, H] -> [B, heads, S, H/heads]"""
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, heads, S, D] -> [B, S, heads*D]"""
    b, n, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, n * d)


def attention_core(q, k, v, mask, *, dropout_rate=0.0, rng=None, train=False):
    """Scaled dot-product attention with an additive mask.

    q,k,v: [B, heads, S_q|S_kv, D].  ``mask`` is additive, broadcastable to
    [B, heads, S_q, S_kv] ((1-m)*-10000 as in vilbert/vilbert.py:1282).
    Softmax runs in float32.
    """
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, dropout_rate, rng, train)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    return out


# --------------------------------------------------------------------------- #
# composite blocks
# --------------------------------------------------------------------------- #
def init_self_attention(key, hidden: int, std: float) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "query": init_linear(kq, hidden, hidden, std),
        "key": init_linear(kk, hidden, hidden, std),
        "value": init_linear(kv, hidden, hidden, std),
        "out": init_linear(ko, hidden, hidden, std),
        "ln": init_layer_norm(hidden),
    }


def init_ffn(key, hidden: int, inter: int, std: float) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "inter": init_linear(k1, hidden, inter, std),
        "out": init_linear(k2, inter, hidden, std),
        "ln": init_layer_norm(hidden),
    }


def init_transformer_layer(key, hidden: int, inter: int, std: float) -> Params:
    k1, k2 = jax.random.split(key)
    return {"attn": init_self_attention(k1, hidden, std),
            "ffn": init_ffn(k2, hidden, inter, std)}


def self_attention_block(x, mask, p: Params, num_heads: int, *,
                         attn_dropout: float, hidden_dropout: float,
                         rng=None, train=False,
                         attention_fn=None, epilogue_fn=None):
    """BertAttention: self-attn -> proj -> dropout -> add&norm.

    Mirrors reference BertSelfAttention+BertSelfOutput
    (vilbert/vilbert.py:258-337)."""
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    # note: a fused QKV projection was benchmarked and is performance-neutral
    # here (XLA already pipelines the three dots); separate projections keep
    # the TP sharding rules and checkpoint mapping simple
    q = split_heads(linear(x, p["query"]), num_heads)
    k = split_heads(linear(x, p["key"]), num_heads)
    v = split_heads(linear(x, p["value"]), num_heads)
    fn = attention_fn or attention_core
    ctx = fn(q, k, v, mask, dropout_rate=attn_dropout, rng=rngs[0], train=train)
    ctx = merge_heads(ctx)
    h = linear(ctx, p["out"])
    return dropout_add_ln(h, x, p["ln"], hidden_dropout, rngs[1], train,
                          epilogue_fn)


def ffn_block(x, p: Params, act: str, *, hidden_dropout: float,
              rng=None, train=False, epilogue_fn=None):
    """BertIntermediate+BertOutput (vilbert/vilbert.py:340-368)."""
    h = ACT2FN[act](linear(x, p["inter"]))
    h = linear(h, p["out"])
    return dropout_add_ln(h, x, p["ln"], hidden_dropout, rng, train,
                          epilogue_fn)


def transformer_layer(x, mask, p: Params, num_heads: int, act: str, *,
                      attn_dropout: float, hidden_dropout: float,
                      rng=None, train=False, attention_fn=None,
                      epilogue_fn=None):
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    a = self_attention_block(x, mask, p["attn"], num_heads,
                             attn_dropout=attn_dropout,
                             hidden_dropout=hidden_dropout,
                             rng=rngs[0], train=train,
                             attention_fn=attention_fn,
                             epilogue_fn=epilogue_fn)
    return ffn_block(a, p["ffn"], act, hidden_dropout=hidden_dropout,
                     rng=rngs[1], train=train, epilogue_fn=epilogue_fn)
