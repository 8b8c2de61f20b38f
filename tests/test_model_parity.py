"""Activation parity of the JAX model vs the reference PyTorch ViLBERT.

Gate from SURVEY.md §7.1: per-layer/output parity on a fixed batch (<=1e-4).
The reference implementation is imported read-only from /root/reference and
driven in eval mode; its randomly-initialized state dict is converted through
models/torch_io.py into our pytree.
"""
import numpy as np
import pytest

from conftest import import_reference_vilbert

from youtube_vln_tpu.config import tiny_config
from youtube_vln_tpu.models import init_lily_params, lily_forward, bert_model
from youtube_vln_tpu.models.torch_io import (
    state_dict_to_params,
    params_to_state_dict,
)


def _tiny_ref_config(ref, **overrides):
    kw = dict(
        vocab_size=256, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        v_feature_size=64, v_target_size=23, v_hidden_size=48,
        v_num_hidden_layers=2, v_num_attention_heads=4,
        v_intermediate_size=48, bi_hidden_size=48, bi_num_attention_heads=4,
        v_biattention_id=(0, 1), t_biattention_id=(2, 3),
        max_position_embeddings=64,
    )
    kw.update(overrides)
    return ref.BertConfig(**kw)


def _random_batch(rng, n=3, s_t=12, s_v=20, v_feat=64, path_len=4):
    tokens = rng.integers(1, 256, size=(n, s_t))
    tokens[:, 0] = 101
    t_mask = np.ones((n, s_t), np.int64)
    t_mask[:, 10:] = 0
    feats = rng.normal(size=(n, s_v, v_feat)).astype(np.float32)
    locs = rng.random(size=(n, s_v, 12)).astype(np.float32)
    locs[..., 11] = rng.integers(0, path_len, size=(n, s_v))
    v_mask = np.ones((n, s_v), np.int64)
    v_mask[:, 17:] = 0
    return tokens, t_mask, feats, locs, v_mask


@pytest.fixture(scope="module")
def ref():
    return import_reference_vilbert()


def test_bert_model_parity(ref, rng):
    import torch
    torch.manual_seed(0)
    ref_cfg = _tiny_ref_config(ref)
    ref_model = ref.BertModel(ref_cfg).eval()

    cfg = tiny_config()
    import jax
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = {k: v for k, v in ref_model.state_dict().items()}
    params, missing, unexpected = state_dict_to_params(sd, cfg, params)
    # the BertModel dump has no heads; heads stay at init
    assert not [k for k in unexpected if "q_dense" not in k], unexpected

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng)

    with torch.no_grad():
        rt, rv, rpt, rpv, _ = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask),
        )

    jt, jv, jpt, jpv = bert_model(
        params, cfg, tokens, feats, locs,
        attention_mask=t_mask, image_attention_mask=v_mask, train=False)

    np.testing.assert_allclose(np.asarray(jt), rt.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), rv.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jpt), rpt.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jpv), rpv.numpy(), atol=1e-4, rtol=1e-4)


def test_lily_parity_all_heads(ref, rng):
    import torch
    from types import SimpleNamespace
    import sys
    sys.path.insert(0, "/root/reference")
    from lily import Lily  # reference task model

    torch.manual_seed(1)
    args = SimpleNamespace(model_name="vilbert", ranking=True, traj_judge=True,
                           masked_vision=True, masked_language=True)
    ref_cfg = _tiny_ref_config(ref)
    ref_cfg.args = args
    ref_model = Lily(ref_cfg).eval()

    cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    import jax
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, missing, unexpected = state_dict_to_params(
        ref_model.state_dict(), cfg, params)
    assert not missing, missing
    assert not [k for k in unexpected if "q_dense" not in k], unexpected

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask),
        )

    jax_out = lily_forward(params, cfg, tokens, feats, locs,
                           attention_mask=t_mask,
                           image_attention_mask=v_mask, train=False)

    assert set(jax_out) == set(ref_out) == {"ranking", "traj", "vision",
                                            "language"}
    for k in ref_out:
        np.testing.assert_allclose(np.asarray(jax_out[k]), ref_out[k].numpy(),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_state_dict_round_trip(ref):
    """export -> reference load -> re-export must be lossless."""
    import torch
    import jax
    cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    params = init_lily_params(jax.random.PRNGKey(42), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = params_to_state_dict(params, cfg)

    params2 = init_lily_params(jax.random.PRNGKey(7), cfg)
    params2 = jax.tree_util.tree_map(np.asarray, params2)
    params2, missing, unexpected = state_dict_to_params(sd, cfg, params2)
    assert not missing and not [k for k in unexpected if "q_dense" not in k]

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    for k, v in flat1:
        np.testing.assert_array_equal(v, flat2[jax.tree_util.keystr(k)])


@pytest.mark.parametrize("mode", ["in_batch_pairs", "fast_mode"])
def test_encoder_modes_parity(ref, rng, mode):
    """in_batch_pairs batch^2 expansion and FAST_MODE text broadcast
    (reference vilbert.py:771-782)."""
    import torch
    torch.manual_seed(3)
    kw = {mode: True}
    ref_cfg = _tiny_ref_config(ref, **kw)
    ref_model = ref.BertModel(ref_cfg).eval()

    cfg = tiny_config(**kw)
    import jax
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, _, _ = state_dict_to_params(ref_model.state_dict(), cfg, params)

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng, n=2)
    if mode == "fast_mode":
        # FAST_MODE: one instruction row expanded over all image rows
        tokens, t_mask = tokens[:1], t_mask[:1]

    with torch.no_grad():
        rt, rv, rpt, rpv, _ = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask))
    jt, jv, jpt, jpv = bert_model(params, cfg, tokens, feats, locs,
                                  attention_mask=t_mask,
                                  image_attention_mask=v_mask, train=False)
    np.testing.assert_allclose(np.asarray(jt), rt.numpy(), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), rv.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_remat_matches_no_remat(rng):
    """cfg.remat=True (jax.checkpoint around every encoder block) must not
    change outputs or gradients — only the memory/recompute schedule.  Also
    covers rng threading through the _maybe_remat wrappers with dropout on
    (same key -> same masks either way)."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    n, s_t, s_v = 3, 10, 16
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (n, s_t)))
    feats = jnp.asarray(rng.normal(size=(n, s_v, cfg.v_feature_size)),
                        jnp.float32)
    locs = jnp.asarray(rng.random((n, s_v, 12)), jnp.float32)

    def loss(p, c):
        out = lily_forward(p, c, tokens, feats, locs,
                           rng=jax.random.PRNGKey(5), train=True)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values())

    l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    # remat recompute reorders the f32 reductions feeding the scalar loss;
    # measured drift is ~1.5e-6 rel (and varies with jit-cache state), while
    # a divergent dropout mask shows as O(1) — 1e-5 separates the two.
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # the recompute reorders f32 reductions, so near-zero leaves carry
    # ~5e-5 absolute noise; anything larger would indicate divergent
    # dropout masks or a broken checkpoint wrapper
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)


def test_fixed_layer_domain_matches_reference():
    """The reference asserts the frozen prefix ends before every
    co-attention block (vilbert.py:742-743, binding at the FIRST block);
    our config must reject the same domain at construction — past it, the
    encoder's min(fixed, v_end) would silently DEFER the overhang layers
    past the first connection instead of failing like the reference."""
    tiny_config(fixed_t_layer=2)                   # == t_biattention_id[0]
    with pytest.raises(AssertionError):
        tiny_config(fixed_v_layer=1)               # > v_biattention_id[0]=0
    with pytest.raises(AssertionError):
        tiny_config(fixed_t_layer=3)               # > t_biattention_id[0]=2


# --------------------------------------------------------------------------- #
# legacy task heads (vilbert.py:1373-1535) — untested before r5, and the
# r5 review found three real deviations (GELU+LayerNorm instead of the
# weight-normed ReLU classifier, and two missing hard-coded dropouts)
# --------------------------------------------------------------------------- #
def test_legacy_multimodal_pretraining_parity(ref, rng):
    """BertForMultiModalPreTraining forward (no labels): the three
    prediction tensors must match the reference in eval mode on an
    imported state dict."""
    import torch

    import jax
    from youtube_vln_tpu.models import legacy as LG

    torch.manual_seed(3)
    ref_model = ref.BertForMultiModalPreTraining(_tiny_ref_config(ref)).eval()

    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, _, unexpected = state_dict_to_params(
        ref_model.state_dict(), cfg, params)
    assert not [k for k in unexpected if "q_dense" not in k], unexpected

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng)
    with torch.no_grad():
        rt, rv, rrel, _ = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask))

    lm, vision, seq_rel = LG.multimodal_pretraining_forward(
        params, cfg, tokens, feats, locs, attention_mask=t_mask,
        image_attention_mask=v_mask, train=False)
    np.testing.assert_allclose(np.asarray(lm), rt.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vision), rv.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(seq_rel), rrel.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_legacy_vl_tasks_classifier_parity(ref, rng):
    """VILBertForVLTasks.vil_prediction: fused pool -> (inert eval
    dropout) -> weight_norm(Linear)->ReLU->Dropout->weight_norm(Linear).
    Imports the reference's weight_g/weight_v (dim=None: scalar g over
    the whole matrix) and checks the classifier output."""
    import torch

    import jax
    from youtube_vln_tpu.models import legacy as LG

    torch.manual_seed(4)
    n_labels = 5
    ref_model = ref.VILBertForVLTasks(
        _tiny_ref_config(ref), num_labels=n_labels).eval()

    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, _, _ = state_dict_to_params(ref_model.state_dict(), cfg, params)

    sd = ref_model.state_dict()

    def wn(prefix):
        return {"v": sd[f"{prefix}.weight_v"].numpy().T,
                "g": np.float32(sd[f"{prefix}.weight_g"].numpy()),
                "b": sd[f"{prefix}.bias"].numpy()}

    cls_params = {"dense1": wn("vil_prediction.main.0"),
                  "dense2": wn("vil_prediction.main.3")}

    tokens, t_mask, feats, locs, v_mask = _random_batch(rng)
    with torch.no_grad():
        outs = ref_model(
            torch.from_numpy(tokens), torch.from_numpy(feats),
            torch.from_numpy(locs),
            attention_mask=torch.from_numpy(t_mask),
            image_attention_mask=torch.from_numpy(v_mask))
    vil_prediction = outs[0]

    got = LG.vl_tasks_forward(params, cfg, cls_params, tokens, feats, locs,
                              attention_mask=t_mask,
                              image_attention_mask=v_mask, train=False)
    assert got.shape == (len(tokens), n_labels)
    np.testing.assert_allclose(np.asarray(got), vil_prediction.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_legacy_head_dropouts_active_in_train_mode(rng):
    """The reference hard-codes Dropout(0.1) on the fused pool
    (BertPreTrainingHeads, vilbert.py:937) and Dropout(0.5) inside
    SimpleClassifier (:1466) — both were missing before r5.  With
    model-body dropout zeroed, train=True must still differ from eval
    through exactly those head dropouts."""
    import dataclasses

    import jax
    from youtube_vln_tpu.models import legacy as LG

    cfg = dataclasses.replace(
        tiny_config(), hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    tokens, t_mask, feats, locs, v_mask = _random_batch(rng)

    _, _, rel_eval = LG.multimodal_pretraining_forward(
        params, cfg, tokens, feats, locs, attention_mask=t_mask,
        image_attention_mask=v_mask, train=False)
    _, _, rel_train = LG.multimodal_pretraining_forward(
        params, cfg, tokens, feats, locs, attention_mask=t_mask,
        image_attention_mask=v_mask, rng=jax.random.PRNGKey(7), train=True)
    assert not np.allclose(np.asarray(rel_eval), np.asarray(rel_train))

    cls = LG.init_simple_classifier(jax.random.PRNGKey(1),
                                    cfg.bi_hidden_size,
                                    cfg.bi_hidden_size * 2, 3)
    v_eval = LG.vl_tasks_forward(params, cfg, cls, tokens, feats, locs,
                                 attention_mask=t_mask,
                                 image_attention_mask=v_mask, train=False)
    v_train = LG.vl_tasks_forward(params, cfg, cls, tokens, feats, locs,
                                  attention_mask=t_mask,
                                  image_attention_mask=v_mask,
                                  rng=jax.random.PRNGKey(8), train=True)
    assert not np.allclose(np.asarray(v_eval), np.asarray(v_train))
