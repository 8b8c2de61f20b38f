"""PyTorch checkpoint interop.

Imports the exact key layout produced by the reference (``Lily`` /
``BertModel`` state dicts, ``utils/utils_init.py:277-295`` save format) into
our parameter pytree, and exports back, so released checkpoints
(ViLBERT Conceptual-Captions init and Lily ``.bin`` files) are consumable
and our checkpoints are loadable by the original PyTorch code.

Handled quirks (reference ``vilbert/vilbert.py:1104-1160``):
  * ``{"model_state_dict": ...}`` wrappers
  * ``gamma``/``beta`` -> ``weight``/``bias`` renames
  * ``bert.``-prefix-less ViLBERT checkpoints (pure BertModel dumps)
  * tied MLM decoder weight (``cls.predictions.decoder.weight`` is the word
    embedding; only ``cls.predictions.bias`` is independent)
  * torch ``nn.Linear`` stores kernels ``[out, in]``; ours are ``[in, out]``
  * the reference's ``biOutput.q_dense1/q_dense2`` are parameters that its
    forward never reads (vilbert.py:628-650); we don't carry them and export
    zeros for compatibility.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from ..config import LilyConfig

# (torch_key_prefix, tree path, kind)
# kind: "linear" (weight.T + bias), "ln" (weight + bias), "emb" (weight)


def _key_map(cfg: LilyConfig) -> List[Tuple[str, Tuple, str]]:
    m: List[Tuple[str, Tuple, str]] = []
    add = m.append

    add(("bert.embeddings.word_embeddings", ("text_embed", "word"), "emb"))
    add(("bert.embeddings.position_embeddings", ("text_embed", "pos"), "emb"))
    add(("bert.embeddings.token_type_embeddings", ("text_embed", "type"), "emb"))
    add(("bert.embeddings.LayerNorm", ("text_embed", "ln"), "ln"))

    add(("bert.v_embeddings.image_embeddings", ("vis_embed", "img"), "linear"))
    add(("bert.v_embeddings.image_location_embeddings", ("vis_embed", "loc"), "linear"))
    add(("bert.v_embeddings.image_orientation_embeddings", ("vis_embed", "orient"), "linear"))
    add(("bert.v_embeddings.image_next_orientation_embeddings", ("vis_embed", "next_orient"), "linear"))
    add(("bert.v_embeddings.image_sequence_embeddings", ("vis_embed", "seq"), "emb"))
    add(("bert.v_embeddings.LayerNorm", ("vis_embed", "ln"), "ln"))

    def layer(prefix, tree_prefix):
        add((f"{prefix}.attention.self.query", tree_prefix + ("attn", "query"), "linear"))
        add((f"{prefix}.attention.self.key", tree_prefix + ("attn", "key"), "linear"))
        add((f"{prefix}.attention.self.value", tree_prefix + ("attn", "value"), "linear"))
        add((f"{prefix}.attention.output.dense", tree_prefix + ("attn", "out"), "linear"))
        add((f"{prefix}.attention.output.LayerNorm", tree_prefix + ("attn", "ln"), "ln"))
        add((f"{prefix}.intermediate.dense", tree_prefix + ("ffn", "inter"), "linear"))
        add((f"{prefix}.output.dense", tree_prefix + ("ffn", "out"), "linear"))
        add((f"{prefix}.output.LayerNorm", tree_prefix + ("ffn", "ln"), "ln"))

    for i in range(cfg.num_hidden_layers):
        layer(f"bert.encoder.layer.{i}", ("text_layers", i))
    for i in range(cfg.v_num_hidden_layers):
        layer(f"bert.encoder.v_layer.{i}", ("vis_layers", i))

    for i in range(len(cfg.v_biattention_id)):
        p = f"bert.encoder.c_layer.{i}"
        t = ("cross_layers", i)
        for name in ("query1", "key1", "value1", "query2", "key2", "value2"):
            add((f"{p}.biattention.{name}", t + ("bi", name), "linear"))
        add((f"{p}.biOutput.dense1", t + ("out", "dense1"), "linear"))
        add((f"{p}.biOutput.LayerNorm1", t + ("out", "ln1"), "ln"))
        add((f"{p}.biOutput.dense2", t + ("out", "dense2"), "linear"))
        add((f"{p}.biOutput.LayerNorm2", t + ("out", "ln2"), "ln"))
        add((f"{p}.v_intermediate.dense", t + ("v_ffn", "inter"), "linear"))
        add((f"{p}.v_output.dense", t + ("v_ffn", "out"), "linear"))
        add((f"{p}.v_output.LayerNorm", t + ("v_ffn", "ln"), "ln"))
        add((f"{p}.t_intermediate.dense", t + ("t_ffn", "inter"), "linear"))
        add((f"{p}.t_output.dense", t + ("t_ffn", "out"), "linear"))
        add((f"{p}.t_output.LayerNorm", t + ("t_ffn", "ln"), "ln"))

    add(("bert.t_pooler.dense", ("t_pooler",), "linear"))
    add(("bert.v_pooler.dense", ("v_pooler",), "linear"))

    add(("cls.predictions.transform.dense", ("cls", "transform", "dense"), "linear"))
    add(("cls.predictions.transform.LayerNorm", ("cls", "transform", "ln"), "ln"))
    add(("cls.bi_seq_relationship", ("cls", "seq_rel"), "linear"))
    add(("cls.imagePredictions.transform.dense", ("cls", "img_head", "transform", "dense"), "linear"))
    add(("cls.imagePredictions.transform.LayerNorm", ("cls", "img_head", "transform", "ln"), "ln"))
    add(("cls.imagePredictions.decoder", ("cls", "img_head", "decoder"), "linear"))
    add(("vil_logit", ("vil_logit",), "linear"))
    add(("judge", ("judge",), "linear"))
    return m


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def normalize_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Unwrap, rename gamma/beta, add ``bert.`` prefix when absent, to numpy."""
    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]
    out = {}
    has_bert_prefix = any(k.startswith("bert.") for k in state_dict)
    for k, v in state_dict.items():
        k = k.replace("gamma", "weight").replace("beta", "bias")
        if not has_bert_prefix and not k.startswith(("cls.", "vil_logit", "judge")):
            # pure BertModel dump (embeddings.* / encoder.* ...) -> bert.*
            k = "bert." + k
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def state_dict_to_params(state_dict: Dict[str, Any], cfg: LilyConfig,
                         params: Dict[str, Any]):
    """Copy a (normalized or raw) torch state dict into a param pytree.

    ``params`` should come from ``init_lily_params``; entries missing from
    the checkpoint keep their initialization (matching the reference's
    non-strict load, vilbert.py:1161-1172).  Returns
    (params, missing_keys, unexpected_keys).
    """
    sd = normalize_state_dict(state_dict)
    consumed = set()
    missing: List[str] = []

    for tk, path, kind in _key_map(cfg):
        if kind == "emb":
            names = [f"{tk}.weight"]
        else:
            names = [f"{tk}.weight", f"{tk}.bias"]
        # load per-tensor, like the reference's non-strict recursive
        # _load_from_state_dict: a checkpoint holding only the weight of
        # a mapped linear (hand-exported / pruned) still restores it, with
        # the bias left at init and reported missing — skipping the whole
        # entry would both train from a random weight AND mislabel the
        # loadable tensor as "unexpected"
        missing.extend(n for n in names if n not in sd)
        w_name = names[0]
        if kind == "emb":
            if w_name in sd:
                _set(params, path, np.asarray(sd[w_name], np.float32))
                consumed.add(w_name)
            continue
        node = _get(params, path)
        if w_name in sd:
            w = np.asarray(sd[w_name], np.float32)
            node["w"] = w if kind == "ln" else w.T.copy()
            consumed.add(w_name)
        if names[1] in sd:
            node["b"] = np.asarray(sd[names[1]], np.float32)
            consumed.add(names[1])

    if "cls.predictions.bias" in sd:
        params["cls"]["decoder_bias"] = np.asarray(sd["cls.predictions.bias"],
                                                   np.float32)
        consumed.add("cls.predictions.bias")
    else:
        missing.append("cls.predictions.bias")
    consumed.add("cls.predictions.decoder.weight")  # tied; ignore

    unexpected = [k for k in sd if k not in consumed]
    return params, missing, unexpected


def params_to_state_dict(params: Dict[str, Any], cfg: LilyConfig) -> Dict[str, np.ndarray]:
    """Export our pytree as a reference-compatible state dict (numpy)."""
    sd: Dict[str, np.ndarray] = {}
    for tk, path, kind in _key_map(cfg):
        node = _get(params, path)
        if kind == "emb":
            sd[f"{tk}.weight"] = np.asarray(node, np.float32)
        elif kind == "ln":
            sd[f"{tk}.weight"] = np.asarray(node["w"], np.float32)
            sd[f"{tk}.bias"] = np.asarray(node["b"], np.float32)
        else:
            sd[f"{tk}.weight"] = np.ascontiguousarray(
                np.asarray(node["w"], np.float32).T)
            sd[f"{tk}.bias"] = np.asarray(node["b"], np.float32)

    # tied decoder: alias the SAME numpy object the loop just exported —
    # np.asarray on a jax leaf materializes a fresh array per call, and the
    # pickler's id()-based storage dedup would then write the 30522x768
    # embedding twice (~94 MB extra per checkpoint) instead of sharing one
    # storage like torch.save does for tied weights
    sd["cls.predictions.decoder.weight"] = (
        sd["bert.embeddings.word_embeddings.weight"])
    sd["cls.predictions.bias"] = np.asarray(params["cls"]["decoder_bias"],
                                            np.float32)
    # unused-in-forward reference params, exported for load compatibility
    for i in range(len(cfg.v_biattention_id)):
        sd[f"bert.encoder.c_layer.{i}.biOutput.q_dense1.weight"] = np.zeros(
            (cfg.v_hidden_size, cfg.bi_hidden_size), np.float32)
        sd[f"bert.encoder.c_layer.{i}.biOutput.q_dense1.bias"] = np.zeros(
            (cfg.v_hidden_size,), np.float32)
        sd[f"bert.encoder.c_layer.{i}.biOutput.q_dense2.weight"] = np.zeros(
            (cfg.hidden_size, cfg.bi_hidden_size), np.float32)
        sd[f"bert.encoder.c_layer.{i}.biOutput.q_dense2.bias"] = np.zeros(
            (cfg.hidden_size,), np.float32)
    return sd


def load_torch_checkpoint(path: str, cfg: LilyConfig, params: Dict[str, Any]):
    """Load a reference ``.bin`` file (zip or legacy format; no torch
    needed — models/torch_serialization.py)."""
    from . import torch_serialization
    state_dict = torch_serialization.load(path)
    return state_dict_to_params(state_dict, cfg, params)


def save_torch_checkpoint(path: str, params: Dict[str, Any], cfg: LilyConfig,
                          extra: Dict[str, Any] = None):
    """Write a ``.bin`` loadable by the reference (utils_init.py:277-295)
    via the pure-Python writer (torch needs not be installed on TPU hosts;
    the output loads under torch.load including weights_only=True).

    Atomic: writes to a sibling temp file and renames, so a crash mid-save
    never corrupts (or half-overwrites) the previous checkpoint."""
    import os

    from . import torch_serialization
    sd = params_to_state_dict(params, cfg)
    payload = {"model_state_dict": sd}
    if extra:
        payload.update(extra)
    tmp = f"{path}.tmp"
    torch_serialization.save(payload, tmp)
    os.replace(tmp, path)
