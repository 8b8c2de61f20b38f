"""FULL-real-config structural parity vs the reference PyTorch stack.

VERDICT r4 top item: every prior parity test reduces DEPTH — toy tests run
4/2 layers with connections at (0,1)/(2,3); the flagship-width gate
(test_flagship_parity.py) runs 2/1 layers with ONE connection.  The shipped
config (``configs/bert_base_6_layer_6_connect.json``) interleaves 12 text +
6 vision layers with SIX connections at ``t_biattention_id=[6..11]`` /
``v_biattention_id=[0..5]`` — a schedule where the vision stack is consumed
entirely by connection layers and the text stack runs 6 plain layers before
the first connection.  This file runs that literal config, full depth
(~250M params), against the live reference:

  * all-four-head forward parity at seq 60/808 (the real geometry), f32
  * frozen-prefix gradient semantics at the real ids (``fixed_t_layer=6``;
    ``fixed_v_layer`` is pinned to 0 by the reference's own per-block
    assert ``fixed_v_layer <= v_end`` with ``v_end=0`` on the first block,
    vilbert.py:745-746 — a nonzero value cannot run on this schedule)

Reference anchors: vilbert/vilbert.py:681-818 (interleave),
:745-764 (frozen prefixes), lily.py:58-129.

Slow file (several minutes on the 1-core box) — kept out of the fast suite
the same way test_e2e.py / test_flagship_parity.py are.
"""
import dataclasses
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

from conftest import REPO_ROOT, import_reference_vilbert

from youtube_vln_tpu.config import LilyConfig
from youtube_vln_tpu.models import init_lily_params, lily_forward
from youtube_vln_tpu.models.torch_io import (
    params_to_state_dict,
    state_dict_to_params,
)

CONFIG_JSON = REPO_ROOT / "configs" / "bert_base_6_layer_6_connect.json"
VOCAB, V_TARGET = 30522, 1601

NO_DROPOUT = dict(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                  v_hidden_dropout_prob=0.0,
                  v_attention_probs_dropout_prob=0.0,
                  fusion_dropout_prob=0.0)


@pytest.fixture(scope="module")
def ref():
    return import_reference_vilbert()


def _full_cfg(**overrides):
    cfg = LilyConfig.from_json_file(CONFIG_JSON)
    return dataclasses.replace(cfg, **overrides)


def _full_ref_model(ref, jax_cfg):
    """Build the reference Lily on the SAME json config, dropout zeroed."""
    sys.path.insert(0, "/root/reference")
    from lily import Lily

    ref_cfg = ref.BertConfig.from_json_file(str(CONFIG_JSON))
    for k, v in NO_DROPOUT.items():
        if k != "fusion_dropout_prob":
            setattr(ref_cfg, k, v)
    ref_cfg.args = SimpleNamespace(
        model_name="vilbert", ranking=jax_cfg.ranking,
        traj_judge=jax_cfg.traj_judge, masked_vision=jax_cfg.masked_vision,
        masked_language=jax_cfg.masked_language)
    ref_cfg.fixed_t_layer = jax_cfg.fixed_t_layer
    ref_cfg.fixed_v_layer = jax_cfg.fixed_v_layer
    model = Lily(ref_cfg)
    model.dropout.p = 0.0  # ctor hard-defaults 0.1 (lily.py:24)
    return model


def _import_ref_weights(ref_model, cfg):
    import jax
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, missing, unexpected = state_dict_to_params(
        ref_model.state_dict(), cfg, params)
    assert not missing, missing
    assert not [k for k in unexpected if "q_dense" not in k], unexpected
    return params


def _random_batch(rng, n, s_t, s_v, path_len=7):
    tokens = rng.integers(1, VOCAB, size=(n, s_t))
    tokens[:, 0] = 101
    t_mask = np.ones((n, s_t), np.int64)
    t_mask[:, s_t - 4:] = 0
    feats = rng.normal(size=(n, s_v, 2048)).astype(np.float32)
    locs = rng.random(size=(n, s_v, 12)).astype(np.float32)
    locs[..., 11] = rng.integers(0, path_len, size=(n, s_v))
    v_mask = np.ones((n, s_v), np.int64)
    v_mask[:, s_v - 9:] = 0
    return tokens, t_mask, feats, locs, v_mask


def test_real_schedule_all_heads_forward_parity(ref, rng):
    """Forward parity for the literal shipped topology: 12 text / 6 vision
    layers, six connections at t[6..11]/v[0..5], seq 60/808, all four
    heads, f32."""
    torch.manual_seed(0)
    cfg = _full_cfg(ranking=True, traj_judge=True, masked_vision=True,
                    masked_language=True)
    assert cfg.num_hidden_layers == 12 and cfg.v_num_hidden_layers == 6
    assert cfg.t_biattention_id == (6, 7, 8, 9, 10, 11)
    assert cfg.v_biattention_id == (0, 1, 2, 3, 4, 5)

    ref_model = _full_ref_model(ref, cfg).eval()
    params = _import_ref_weights(ref_model, cfg)

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng, n=2, s_t=60,
                                                        s_v=808)
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask))

    jax_out = lily_forward(params, cfg, tokens, feats, locs,
                           attention_mask=t_mask,
                           image_attention_mask=v_mask, train=False)

    assert set(jax_out) == set(ref_out) == {"ranking", "traj", "vision",
                                            "language"}
    for k in ref_out:
        exp = ref_out[k].numpy()
        got = np.asarray(jax_out[k])
        scale = max(np.abs(exp).max(), 1.0)
        np.testing.assert_allclose(got, exp, atol=1e-4 * scale, rtol=1e-4,
                                   err_msg=k)


def test_real_schedule_frozen_prefix_grads(ref, rng):
    """Frozen-prefix semantics at the REAL ids: ``fixed_t_layer=6`` freezes
    exactly text layers 0-5 (everything before the first connection).
    One backward through all four heads at full depth; frozen layers must
    receive no gradient on either stack and every trained parameter's
    gradient must match across stacks.

    ``fixed_v_layer`` stays 0: the reference asserts
    ``fixed_v_layer <= v_end`` per connection block (vilbert.py:745-746)
    and the first block has ``v_end=0`` on this schedule, so any nonzero
    value crashes the reference; our config replicates the constraint
    (config.py:93-96)."""
    import jax
    import jax.numpy as jnp

    torch.manual_seed(1)
    cfg = _full_cfg(ranking=True, traj_judge=True, masked_vision=True,
                    masked_language=True, fixed_t_layer=6, fixed_v_layer=0,
                    **NO_DROPOUT)
    ref_model = _full_ref_model(ref, cfg).eval()
    params = _import_ref_weights(ref_model, cfg)

    # seq_v reduced: frozen-prefix routing depends on the layer schedule,
    # not the sequence extent (the 808-region case is covered by the
    # forward test above and test_flagship_parity's bwd case)
    tokens, t_mask, feats, locs, v_mask = _random_batch(rng, n=2, s_t=60,
                                                        s_v=96)

    # A head-exercising scalar with softmax-like gradient structure,
    # identical on both stacks (no targets/masking machinery needed).
    def torch_loss(out):
        return (torch.tanh(out["ranking"]).mean()
                + torch.tanh(out["traj"]).mean()
                + torch.logsumexp(out["language"], -1).mean()
                + torch.logsumexp(out["vision"], -1).mean())

    out = ref_model(torch.from_numpy(tokens), torch.from_numpy(feats),
                    torch.from_numpy(locs),
                    attention_mask=torch.from_numpy(t_mask),
                    image_attention_mask=torch.from_numpy(v_mask))
    torch_loss(out).backward()
    ref_grads = {n: p.grad for n, p in ref_model.named_parameters()}

    def jax_loss(p):
        o = lily_forward(p, cfg, tokens, feats, locs, attention_mask=t_mask,
                         image_attention_mask=v_mask, train=False)
        return (jnp.tanh(o["ranking"]).mean()
                + jnp.tanh(o["traj"]).mean()
                + jax.scipy.special.logsumexp(o["language"], -1).mean()
                + jax.scipy.special.logsumexp(o["vision"], -1).mean())

    grads = jax.grad(jax_loss)(params)
    grad_sd = params_to_state_dict(
        jax.tree_util.tree_map(np.asarray, grads), cfg)

    # every tensor of text layers 0-5 must be gradient-free, and so must
    # the text embeddings that feed ONLY those frozen layers — no_grad on
    # the prefix cuts the graph above them.  The ONE exception is the word
    # embedding: it is tied to the MLM decoder (vilbert.py:901), which
    # sits above the cut, so it still receives the decoder-path gradient.
    frozen = [f"bert.encoder.layer.{i}." for i in range(6)]
    for name, g_ref in ref_grads.items():
        if any(name.startswith(p) for p in frozen):
            assert g_ref is None, name
    assert ref_grads["bert.embeddings.position_embeddings.weight"] is None
    assert ref_grads["bert.embeddings.word_embeddings.weight"] is not None

    n_frozen = n_trained = 0
    for name, g_ref in ref_grads.items():
        if "q_dense" in name:
            continue  # dead reference params, exported as zeros
        g_ours = grad_sd.get(name)
        if g_ours is None:  # tied decoder.weight aliases the embedding
            continue
        if g_ref is None:
            # reference: graph cut by no_grad => .grad stays None; ours:
            # stop_gradient => exact zeros
            assert not np.any(g_ours), name
            n_frozen += 1
            continue
        exp = g_ref.numpy()
        denom = np.linalg.norm(exp)
        if denom < 1e-5:
            # analytically-zero gradients exist: a key BIAS adds the same
            # q.b to every attention logit, which softmax cancels, so
            # d loss/d key.bias == 0 exactly and both stacks hold pure
            # f32 noise (~1e-8) — rel-L2 between two noise vectors is
            # O(1) and meaningless.  Require ours to be equally tiny.
            assert np.linalg.norm(g_ours) < 1e-5, (
                name, denom, np.linalg.norm(g_ours))
            n_trained += 1
            continue
        rel = np.linalg.norm(g_ours - exp) / denom
        assert rel < 5e-4, (name, rel)
        n_trained += 1
    # layers 0-5: (qkv + attn-out + intermediate + output) weights+biases
    # + 2 LayerNorms each = 16 tensors/layer; + position/token-type
    # embeddings and the embedding LayerNorm (4 tensors); + the
    # bi_seq_relationship head, whose score Lily computes but DISCARDS
    # (lily.py:88 unpacks it to `_`), so it too is gradient-free (2)
    assert n_frozen == 6 * 16 + 4 + 2, n_frozen
    assert n_trained > 150, n_trained
