"""TPU-native two-stream ViLBERT encoder and the Lily task model.

This is a re-design, not a port: the model is a pure function over a
parameter pytree, all shapes are static, candidates are flattened into the
batch dimension, and masks are additive tensors computed once.  Behaviour is
matched against the reference implementation:

  * text embeddings           reference ``vilbert/vilbert.py:219-256``
  * vision embeddings (VLN 12-d location split 5/4/2/seq-index)
                              reference ``vilbert/vilbert.py:1340-1370``
  * interleaved encoder with co-attention connection layers
                              reference ``vilbert/vilbert.py:681-818``
  * bi-directional co-attention
                              reference ``vilbert/vilbert.py:512-618``
  * poolers (first token, ReLU)
                              reference ``vilbert/vilbert.py:821-848``
  * MLM / masked-vision / seq-relationship heads
                              reference ``vilbert/vilbert.py:889-969``
  * Lily ranking + judge heads and fused (mul/sum) pooled output
                              reference ``lily.py:23-129``
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import LilyConfig
from . import layers as L


# --------------------------------------------------------------------------- #
# parameter initialization
# --------------------------------------------------------------------------- #
def init_lily_params(key: jax.Array, cfg: LilyConfig) -> Dict[str, Any]:
    std = cfg.initializer_range
    keys = iter(jax.random.split(key, 64))

    params: Dict[str, Any] = {}
    params["text_embed"] = {
        "word": L.init_embedding(next(keys), cfg.vocab_size, cfg.hidden_size, std),
        "pos": L.init_embedding(next(keys), cfg.max_position_embeddings,
                                cfg.hidden_size, std),
        "type": L.init_embedding(next(keys), cfg.type_vocab_size,
                                 cfg.hidden_size, std),
        "ln": L.init_layer_norm(cfg.hidden_size),
    }
    # padding_idx=0 in the reference nn.Embedding zeroes row 0 at init
    params["text_embed"]["word"] = params["text_embed"]["word"].at[0].set(0.0)

    params["vis_embed"] = {
        "img": L.init_linear(next(keys), cfg.v_feature_size, cfg.v_hidden_size, std),
        "loc": L.init_linear(next(keys), 5, cfg.v_hidden_size, std),
        "orient": L.init_linear(next(keys), 4, cfg.v_hidden_size, std),
        "next_orient": L.init_linear(next(keys), 2, cfg.v_hidden_size, std),
        "seq": L.init_embedding(next(keys), 32, cfg.v_hidden_size, std),
        "ln": L.init_layer_norm(cfg.v_hidden_size),
    }

    params["text_layers"] = [
        L.init_transformer_layer(k, cfg.hidden_size, cfg.intermediate_size, std)
        for k in jax.random.split(next(keys), cfg.num_hidden_layers)
    ]
    params["vis_layers"] = [
        L.init_transformer_layer(k, cfg.v_hidden_size, cfg.v_intermediate_size, std)
        for k in jax.random.split(next(keys), cfg.v_num_hidden_layers)
    ]

    def init_connection(k):
        ks = iter(jax.random.split(k, 12))
        return {
            "bi": {
                # stream 1 = vision, stream 2 = text (reference naming)
                "query1": L.init_linear(next(ks), cfg.v_hidden_size, cfg.bi_hidden_size, std),
                "key1": L.init_linear(next(ks), cfg.v_hidden_size, cfg.bi_hidden_size, std),
                "value1": L.init_linear(next(ks), cfg.v_hidden_size, cfg.bi_hidden_size, std),
                "query2": L.init_linear(next(ks), cfg.hidden_size, cfg.bi_hidden_size, std),
                "key2": L.init_linear(next(ks), cfg.hidden_size, cfg.bi_hidden_size, std),
                "value2": L.init_linear(next(ks), cfg.hidden_size, cfg.bi_hidden_size, std),
            },
            "out": {
                "dense1": L.init_linear(next(ks), cfg.bi_hidden_size, cfg.v_hidden_size, std),
                "ln1": L.init_layer_norm(cfg.v_hidden_size),
                "dense2": L.init_linear(next(ks), cfg.bi_hidden_size, cfg.hidden_size, std),
                "ln2": L.init_layer_norm(cfg.hidden_size),
            },
            "v_ffn": L.init_ffn(next(ks), cfg.v_hidden_size, cfg.v_intermediate_size, std),
            "t_ffn": L.init_ffn(next(ks), cfg.hidden_size, cfg.intermediate_size, std),
        }

    params["cross_layers"] = [
        init_connection(k)
        for k in jax.random.split(next(keys), len(cfg.v_biattention_id))
    ]

    params["t_pooler"] = L.init_linear(next(keys), cfg.hidden_size, cfg.bi_hidden_size, std)
    params["v_pooler"] = L.init_linear(next(keys), cfg.v_hidden_size, cfg.bi_hidden_size, std)

    params["cls"] = {
        "transform": {
            "dense": L.init_linear(next(keys), cfg.hidden_size, cfg.hidden_size, std),
            "ln": L.init_layer_norm(cfg.hidden_size),
        },
        # decoder weight is tied to text_embed.word (lily.py:33-35,
        # vilbert/vilbert.py:889-907); only the output bias is a parameter.
        "decoder_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "seq_rel": L.init_linear(next(keys), cfg.bi_hidden_size, 2, std),
        "img_head": {
            "transform": {
                "dense": L.init_linear(next(keys), cfg.v_hidden_size, cfg.v_hidden_size, std),
                "ln": L.init_layer_norm(cfg.v_hidden_size),
            },
            "decoder": L.init_linear(next(keys), cfg.v_hidden_size, cfg.v_target_size, std),
        },
    }
    params["vil_logit"] = L.init_linear(next(keys), cfg.bi_hidden_size, 1, std)
    params["judge"] = L.init_linear(next(keys), cfg.bi_hidden_size, 1, std)
    return params


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


# --------------------------------------------------------------------------- #
# embeddings
# --------------------------------------------------------------------------- #
def text_embeddings(p, cfg: LilyConfig, input_ids, token_type_ids, *,
                    rng=None, train=False, dtype=jnp.float32):
    seq_len = input_ids.shape[1]
    pos_ids = jnp.arange(seq_len)[None, :]
    emb = (p["word"][input_ids] + p["pos"][pos_ids] + p["type"][token_type_ids])
    emb = L.layer_norm(emb.astype(dtype), p["ln"])
    return L.dropout(emb, cfg.hidden_dropout_prob, rng, train)


def vision_embeddings(p, cfg: LilyConfig, feats, locs, *, rng=None,
                      train=False, dtype=jnp.float32):
    """12-d location vector split [:5] box, [5:9] orientation, [9:11]
    next-orientation, [11] step index (reference vilbert.py:1356-1365)."""
    feats = feats.astype(dtype)
    locs = locs.astype(dtype)
    img = L.linear(feats, p["img"])
    a = L.linear(locs[..., :5], p["loc"])
    b = L.linear(locs[..., 5:9], p["orient"])
    c = L.linear(locs[..., 9:11], p["next_orient"])
    d = p["seq"][locs[..., 11].astype(jnp.int32)].astype(dtype)
    emb = L.layer_norm(img + a + b + c + d, p["ln"])
    return L.dropout(emb, cfg.hidden_dropout_prob, rng, train)


# --------------------------------------------------------------------------- #
# co-attention connection layer
# --------------------------------------------------------------------------- #
def bi_attention(p, cfg: LilyConfig, v_x, v_mask, t_x, t_mask, *,
                 rng=None, train=False, attention_fn=None,
                 bi_attention_fn=None):
    """Bi-directional cross attention (reference vilbert.py:552-618).

    Returns (context_for_vision, context_for_text): text queries attend
    vision KV producing the *text*-side context1 and vision queries attend
    text KV producing the *vision*-side context2; the reference then feeds
    (bi_output2 -> vision residual, bi_output1 -> text residual) in
    BertConnectionLayer (vilbert.py:671)."""
    heads = cfg.bi_num_attention_heads
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

    q1 = L.split_heads(L.linear(v_x, p["query1"]), heads)
    k1 = L.split_heads(L.linear(v_x, p["key1"]), heads)
    v1 = L.split_heads(L.linear(v_x, p["value1"]), heads)
    q2 = L.split_heads(L.linear(t_x, p["query2"]), heads)
    k2 = L.split_heads(L.linear(t_x, p["key2"]), heads)
    v2 = L.split_heads(L.linear(t_x, p["value2"]), heads)

    if bi_attention_fn is not None:
        # both directions in ONE kernel launch (ops/attention.py)
        ctx1, ctx2 = bi_attention_fn(
            q1, k1, v1, q2, k2, v2, v_mask, t_mask,
            rate1=cfg.v_attention_probs_dropout_prob,
            rate2=cfg.attention_probs_dropout_prob,
            rng=rngs[0], train=train)
    else:
        fn = attention_fn or L.attention_core
        # text queries -> vision keys/values  (context1: [B, S_t, bi])
        ctx1 = fn(q2, k1, v1, v_mask,
                  dropout_rate=cfg.v_attention_probs_dropout_prob,
                  rng=rngs[0], train=train)
        # vision queries -> text keys/values  (context2: [B, S_v, bi])
        ctx2 = fn(q1, k2, v2, t_mask,
                  dropout_rate=cfg.attention_probs_dropout_prob,
                  rng=rngs[1], train=train)
    return L.merge_heads(ctx1), L.merge_heads(ctx2)


def connection_layer(p, cfg: LilyConfig, v_x, v_mask, t_x, t_mask, *,
                     rng=None, train=False, attention_fn=None,
                     bi_attention_fn=None, epilogue_fn=None):
    """BertConnectionLayer (reference vilbert.py:652-679)."""
    rngs = jax.random.split(rng, 5) if rng is not None else (None,) * 5
    ctx_t, ctx_v = bi_attention(p["bi"], cfg, v_x, v_mask, t_x, t_mask,
                                rng=rngs[0], train=train,
                                attention_fn=attention_fn,
                                bi_attention_fn=bi_attention_fn)
    # BertBiOutput (vilbert.py:620-650): hidden_states1=ctx_v (vision side),
    # hidden_states2=ctx_t (text side)
    o = p["out"]
    v_att = L.dropout_add_ln(L.linear(ctx_v, o["dense1"]), v_x, o["ln1"],
                             cfg.v_hidden_dropout_prob, rngs[1], train,
                             epilogue_fn)
    t_att = L.dropout_add_ln(L.linear(ctx_t, o["dense2"]), t_x, o["ln2"],
                             cfg.hidden_dropout_prob, rngs[2], train,
                             epilogue_fn)
    v_out = L.ffn_block(v_att, p["v_ffn"], cfg.v_hidden_act,
                        hidden_dropout=cfg.v_hidden_dropout_prob,
                        rng=rngs[3], train=train, epilogue_fn=epilogue_fn)
    t_out = L.ffn_block(t_att, p["t_ffn"], cfg.hidden_act,
                        hidden_dropout=cfg.hidden_dropout_prob,
                        rng=rngs[4], train=train, epilogue_fn=epilogue_fn)
    return v_out, t_out


# --------------------------------------------------------------------------- #
# interleaved two-stream encoder
# --------------------------------------------------------------------------- #
def _maybe_remat(fn, enabled):
    return jax.checkpoint(fn) if enabled else fn


def encoder(params, cfg: LilyConfig, t_x, v_x, t_mask, v_mask, *,
            rng=None, train=False, attention_fn=None,
            bi_attention_fn=None, epilogue_fn=None):
    """Interleave vision/text layers with connection layers at the
    (v_biattention_id, t_biattention_id) schedule (reference
    vilbert.py:712-818).  Frozen prefixes (fixed_t_layer / fixed_v_layer)
    run under stop_gradient."""
    n_rngs = (cfg.num_hidden_layers + cfg.v_num_hidden_layers
              + len(cfg.v_biattention_id))
    rngs = (list(jax.random.split(rng, n_rngs)) if rng is not None
            else [None] * n_rngs)
    rng_i = 0

    def t_layer(i, x):
        nonlocal rng_i
        r = rngs[rng_i]; rng_i += 1
        fn = _maybe_remat(
            lambda xx: L.transformer_layer(
                xx, t_mask, params["text_layers"][i], cfg.num_attention_heads,
                cfg.hidden_act, attn_dropout=cfg.attention_probs_dropout_prob,
                hidden_dropout=cfg.hidden_dropout_prob, rng=r, train=train,
                attention_fn=attention_fn, epilogue_fn=epilogue_fn),
            cfg.remat)
        return fn(x)

    def v_layer(i, x):
        nonlocal rng_i
        r = rngs[rng_i]; rng_i += 1
        fn = _maybe_remat(
            lambda xx: L.transformer_layer(
                xx, v_mask, params["vis_layers"][i], cfg.v_num_attention_heads,
                cfg.v_hidden_act,
                attn_dropout=cfg.v_attention_probs_dropout_prob,
                hidden_dropout=cfg.v_hidden_dropout_prob, rng=r, train=train,
                attention_fn=attention_fn, epilogue_fn=epilogue_fn),
            cfg.remat)
        return fn(x)

    v_start, t_start = 0, 0
    for count, (v_end, t_end) in enumerate(
            zip(cfg.v_biattention_id, cfg.t_biattention_id)):
        for idx in range(v_start, min(cfg.fixed_v_layer, v_end)):
            v_x = jax.lax.stop_gradient(v_layer(idx, v_x))
            v_start = cfg.fixed_v_layer
        for idx in range(v_start, v_end):
            v_x = v_layer(idx, v_x)
        for idx in range(t_start, min(cfg.fixed_t_layer, t_end)):
            t_x = jax.lax.stop_gradient(t_layer(idx, t_x))
            t_start = cfg.fixed_t_layer
        for idx in range(t_start, t_end):
            t_x = t_layer(idx, t_x)

        if count == 0 and cfg.in_batch_pairs:
            # batch^2 expansion: every text paired with every image
            # (reference vilbert.py:771-778)
            b = t_x.shape[0]
            v_x = jnp.tile(v_x, (b, 1, 1))
            v_mask = jnp.tile(v_mask, (b, 1, 1, 1))
            t_x = jnp.repeat(t_x, b, axis=0)
            t_mask = jnp.repeat(t_mask, b, axis=0)
        if count == 0 and cfg.fast_mode:
            # broadcast one instruction over all image rows
            # (reference vilbert.py:780-782)
            n = v_x.shape[0]
            t_x = jnp.broadcast_to(t_x, (n,) + t_x.shape[1:])
            t_mask = jnp.broadcast_to(t_mask, (n,) + t_mask.shape[1:])

        if cfg.with_coattention:
            r = rngs[rng_i]; rng_i += 1
            fn = _maybe_remat(
                lambda vv, tt, c=count, rr=r: connection_layer(
                    params["cross_layers"][c], cfg, vv, v_mask, tt, t_mask,
                    rng=rr, train=train, attention_fn=attention_fn,
                    bi_attention_fn=bi_attention_fn, epilogue_fn=epilogue_fn),
                cfg.remat)
            v_x, t_x = fn(v_x, t_x)

        v_start, t_start = v_end, t_end

    for idx in range(v_start, cfg.v_num_hidden_layers):
        v_x = v_layer(idx, v_x)
    for idx in range(t_start, cfg.num_hidden_layers):
        t_x = t_layer(idx, t_x)

    return t_x, v_x


# --------------------------------------------------------------------------- #
# poolers & heads
# --------------------------------------------------------------------------- #
def pooler(x, p):
    """First-token pool -> linear -> ReLU (reference vilbert.py:821-848)."""
    return jax.nn.relu(L.linear(x[:, 0], p))


def mlm_head(p_cls, word_embedding, cfg: LilyConfig, seq_t):
    """Transform + tied decoder + bias (reference vilbert.py:889-907)."""
    t = p_cls["transform"]
    h = L.ACT2FN[cfg.hidden_act](L.linear(seq_t, t["dense"]))
    h = L.layer_norm(h, t["ln"])
    logits = jnp.dot(h, word_embedding.T.astype(h.dtype),
                     preferred_element_type=h.dtype)
    return logits + p_cls["decoder_bias"].astype(h.dtype)


def image_head(p, cfg: LilyConfig, seq_v):
    """Transform + linear to v_target_size (reference vilbert.py:957-969)."""
    t = p["transform"]
    h = L.ACT2FN[cfg.hidden_act](L.linear(seq_v, t["dense"]))
    h = L.layer_norm(h, t["ln"])
    return L.linear(h, p["decoder"])


def fuse_pooled(cfg: LilyConfig, pooled_t, pooled_v):
    if cfg.fusion_method == "sum":
        return pooled_t + pooled_v
    if cfg.fusion_method == "mul":
        return pooled_t * pooled_v
    raise ValueError(cfg.fusion_method)


# --------------------------------------------------------------------------- #
# full model
# --------------------------------------------------------------------------- #
def bert_model(params, cfg: LilyConfig, instr_tokens, image_features,
               image_locations, token_type_ids=None, attention_mask=None,
               image_attention_mask=None, *, rng=None, train=False,
               attention_fn=None, bi_attention_fn=None, epilogue_fn=None):
    """Reference BertModel.forward (vilbert.py:1242-1337).

    All inputs are dense, statically-shaped arrays; candidate padding is
    handled downstream via opt_mask (see training/losses.py)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if attention_fn is None and cfg.use_pallas_attention:
        from ..ops.attention import select_attention_fn, select_bi_attention_fn
        attention_fn = select_attention_fn(cfg)
        if bi_attention_fn is None:
            bi_attention_fn = select_bi_attention_fn(cfg)
        if epilogue_fn is None:
            from ..ops.epilogue import select_epilogue_fn
            epilogue_fn = select_epilogue_fn(cfg)

    if attention_mask is None:
        attention_mask = jnp.ones_like(instr_tokens)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(instr_tokens)
    if image_attention_mask is None:
        image_attention_mask = jnp.ones(image_features.shape[:2],
                                        dtype=instr_tokens.dtype)

    # additive masks, [B, 1, 1, S]
    t_mask = ((1.0 - attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
    v_mask = ((1.0 - image_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    t_x = text_embeddings(params["text_embed"], cfg, instr_tokens,
                          token_type_ids, rng=rngs[0], train=train, dtype=dtype)
    v_x = vision_embeddings(params["vis_embed"], cfg, image_features,
                            image_locations, rng=rngs[1], train=train,
                            dtype=dtype)

    seq_t, seq_v = encoder(params, cfg, t_x, v_x, t_mask, v_mask,
                           rng=rngs[2], train=train, attention_fn=attention_fn,
                           bi_attention_fn=bi_attention_fn,
                           epilogue_fn=epilogue_fn)

    pooled_t = pooler(seq_t, params["t_pooler"])
    pooled_v = pooler(seq_v, params["v_pooler"])
    return seq_t, seq_v, pooled_t, pooled_v


def lily_forward(params, cfg: LilyConfig, instr_tokens, image_features,
                 image_locations, token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, *, rng=None, train=False,
                 attention_fn=None, language_target_idx=None,
                 vision_target_idx=None) -> Dict[str, jnp.ndarray]:
    """Reference Lily.forward (lily.py:58-129).

    Returns float32 outputs keyed by enabled tasks:
      ranking  [N, 1]       vision [N, S_v, v_target]
      traj     [N, 1]       language [N, S_t, vocab]

    ``language_target_idx`` / ``vision_target_idx`` ([N, M] position
    indices) restrict the masked-prediction heads to the rows that carry
    targets — loss-equivalent to the dense heads (the losses ignore every
    other position) at a fraction of the decoder FLOPs; outputs become
    [N, M, vocab] / [N, M, v_target] aligned with the given indices.
    """
    # two consumers: the model body and the fused-pool dropout below
    rngs = jax.random.split(rng, 2) if rng is not None else (None,) * 2
    seq_t, seq_v, pooled_t, pooled_v = bert_model(
        params, cfg, instr_tokens, image_features, image_locations,
        token_type_ids, attention_mask, image_attention_mask,
        rng=rngs[0], train=train, attention_fn=attention_fn)

    outputs: Dict[str, jnp.ndarray] = {}
    if cfg.masked_language:
        h = seq_t
        if language_target_idx is not None:
            h = jnp.take_along_axis(
                seq_t, language_target_idx[..., None].astype(jnp.int32),
                axis=1)
        lm = mlm_head(params["cls"], params["text_embed"]["word"], cfg, h)
        outputs["language"] = lm.astype(jnp.float32)
    if cfg.masked_vision:
        hv = seq_v
        if vision_target_idx is not None:
            hv = jnp.take_along_axis(
                seq_v, vision_target_idx[..., None].astype(jnp.int32),
                axis=1)
        outputs["vision"] = image_head(params["cls"]["img_head"], cfg,
                                       hv).astype(jnp.float32)

    if cfg.ranking or cfg.traj_judge:
        pooled = fuse_pooled(cfg, pooled_t, pooled_v)
        # Lily applies its own dropout on the fused pooled output
        # (lily.py:51,100 — ctor default 0.1); the cls-head dropout path is
        # not used for ranking/judge logits.
        pooled = L.dropout(pooled, cfg.fusion_dropout_prob, rngs[1], train)
        if cfg.ranking:
            outputs["ranking"] = L.linear(pooled, params["vil_logit"]).astype(jnp.float32)
        if cfg.traj_judge:
            outputs["traj"] = L.linear(pooled, params["judge"]).astype(jnp.float32)
    return outputs
