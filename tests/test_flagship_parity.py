"""Flagship-WIDTH numerical parity vs the reference PyTorch stack.

VERDICT r3 top item: every other parity test runs at toy widths (hidden
32-48, 4 heads), so a width-dependent import or layout bug — a head
transpose at 12/8/8 heads, the 1601-way vision head, 30522-vocab decoder
tying — would pass the suite.  This file runs the real widths of
``bert_base_6_layer_6_connect.json`` (hidden 768, v_hidden 1024, bi 1024,
heads 12/8/8, vocab 30522, v_target 1601, v_feature 2048, intermediate
3072/1024) with DEPTH reduced to 2 text / 1 vision layers and one
co-attention connection — per-layer math is width-dependent, depth is not.

Covered (reference anchors: vilbert/vilbert.py:1182-1337, lily.py:58-129):
  * all-four-head activation parity at seq 60/808 (the real geometry), f32
  * a 3-step f32 loss trajectory through both full training stacks
    (losses + grads + AdamW + schedule) at flagship widths
  * state-dict export/import round trip at flagship widths

Slow file (~4-8 min on the 1-core box) — kept out of the fast suite the
same way test_e2e.py / test_parallel.py are.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from conftest import import_reference_vilbert

from youtube_vln_tpu.config import RunConfig, lily_base_config
from youtube_vln_tpu.models import init_lily_params, lily_forward
from youtube_vln_tpu.models.torch_io import (
    params_to_state_dict,
    state_dict_to_params,
)
from youtube_vln_tpu.ops.masking import (randomize_regions_np,
                                         randomize_tokens_np)
from youtube_vln_tpu.parallel import train_step as ts

# real widths, reduced depth
DEPTH_KW = dict(
    num_hidden_layers=2,
    v_num_hidden_layers=1,
    v_biattention_id=(0,),
    t_biattention_id=(1,),
)

VOCAB, V_TARGET = 30522, 1601


def _flagship_ref_config(ref, **overrides):
    kw = dict(
        vocab_size=VOCAB, hidden_size=768, num_attention_heads=12,
        intermediate_size=3072, v_feature_size=2048, v_target_size=V_TARGET,
        v_hidden_size=1024, v_num_attention_heads=8,
        v_intermediate_size=1024, bi_hidden_size=1024,
        bi_num_attention_heads=8, max_position_embeddings=512,
        type_vocab_size=2, v_initializer_range=0.02,
        **DEPTH_KW,
    )
    kw.update(overrides)
    return ref.BertConfig(**kw)


def _flagship_cfg(**overrides):
    return lily_base_config(**DEPTH_KW, **overrides)


def _no_dropout(kw):
    # fusion_dropout_prob mirrors the reference's `model.dropout.p = 0.0`
    # poke below (Lily's ctor hard-defaults it to 0.1, lily.py:24).
    kw.update(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
              fusion_dropout_prob=0.0)
    return kw


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


@pytest.fixture(scope="module")
def ref():
    return import_reference_vilbert()


def test_flagship_width_all_heads_parity(ref, rng):
    """Forward parity at the REAL geometry: widths 768/1024/1024, heads
    12/8/8, seq 60 text x 808 vision, all four task heads, f32."""
    import sys
    from types import SimpleNamespace
    sys.path.insert(0, "/root/reference")
    from lily import Lily

    torch.manual_seed(0)
    args = SimpleNamespace(model_name="vilbert", ranking=True,
                           traj_judge=True, masked_vision=True,
                           masked_language=True)
    ref_cfg = _flagship_ref_config(ref)
    ref_cfg.args = args
    ref_model = Lily(ref_cfg).eval()

    cfg = _flagship_cfg(ranking=True, traj_judge=True, masked_vision=True,
                        masked_language=True)
    import jax
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, missing, unexpected = state_dict_to_params(
        ref_model.state_dict(), cfg, params)
    assert not missing, missing
    assert not [k for k in unexpected if "q_dense" not in k], unexpected

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
        # <=1e-4 RELATIVE to the head's own scale (the 30522-logit MLM
        # head legitimately reaches |logit| ~ 15 at init)
        scale = max(np.abs(exp).max(), 1.0)
        np.testing.assert_allclose(got, exp, atol=1e-4 * scale, rtol=1e-4,
                                   err_msg=k)


def test_flagship_width_state_dict_round_trip(rng):
    """export -> import is lossless at real widths (the transpose/tying
    layout bugs VERDICT r3 names would corrupt this)."""
    import jax
    cfg = _flagship_cfg(ranking=True, traj_judge=True, masked_vision=True,
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
        np.testing.assert_array_equal(v, flat2[jax.tree_util.keystr(k)],
                                      err_msg=jax.tree_util.keystr(k))


def _run_loss_trajectory(rng, *, bs, nc, s_t, s_v, n_steps):
    """Drive N full optimizer steps (losses + grads + AdamW + schedule)
    through BOTH stacks at flagship widths; returns (our, ref) loss lists.
    Shared by the s_v=96 3-step case and the s_v=808 real-extent case."""
    ref = import_reference_vilbert()
    import sys
    from types import SimpleNamespace
    sys.path.insert(0, "/root/reference")
    from lily import Lily
    from vilbert.optimization import AdamW, WarmupLinearSchedule

    N_STEPS, LR = n_steps, 1e-4
    torch.manual_seed(1)
    args_ns = SimpleNamespace(model_name="vilbert", ranking=True,
                              traj_judge=True, masked_vision=True,
                              masked_language=True)
    ref_cfg = _flagship_ref_config(ref)
    for k, v in _no_dropout({}).items():
        setattr(ref_cfg, k, v)
    ref_cfg.args = args_ns
    model = Lily(ref_cfg).train()
    model.dropout.p = 0.0
    init_state = {k: v.clone() for k, v in model.state_dict().items()}

    n = bs * nc
    tokens, t_mask, feats, locs, v_mask = _random_batch(rng, n, s_t, s_v)
    probs = rng.random((n, s_v, V_TARGET)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)

    mask_rng = np.random.default_rng(7)
    tokens_m, instr_targets = randomize_tokens_np(tokens, t_mask, VOCAB,
                                                  103, mask_rng)
    feats_m, image_targets, image_targets_mask = randomize_regions_np(
        feats, probs, v_mask, mask_rng)
    ranking_target = np.zeros((bs,), np.int64)

    # ---- reference loop -------------------------------------------------- #
    no_decay = ["bias", "LayerNorm.weight", "LayerNorm.bias"]
    groups = [{"params": [], "weight_decay": 0.0},
              {"params": [], "weight_decay": 1e-2}]
    for name, param in model.named_parameters():
        groups[0 if any(nd in name for nd in no_decay) else 1][
            "params"].append(param)
    opt = AdamW(groups, lr=LR)
    sched = WarmupLinearSchedule(opt, warmup_steps=2, t_total=20)

    tt = lambda x: torch.from_numpy(np.asarray(x))
    ref_losses = []
    for _ in range(N_STEPS):
        out = model(tt(tokens_m), tt(feats_m), tt(locs),
                    attention_mask=tt(t_mask),
                    image_attention_mask=tt(v_mask))
        pred = out["vision"].view(-1, V_TARGET)
        lv = F.kl_div(F.log_softmax(pred, -1),
                      tt(image_targets).view(-1, V_TARGET),
                      reduction="none")
        lv = lv * tt(image_targets_mask).view(-1, 1).float()
        lv = lv.sum() / max(1, int(image_targets_mask.sum()))
        ll = F.cross_entropy(out["language"].view(-1, VOCAB),
                             tt(instr_targets).view(-1), ignore_index=-1)
        lr_ = F.cross_entropy(out["ranking"].view(bs, nc),
                              tt(ranking_target))
        z = torch.zeros(bs, nc)
        z[:, :3] = 1  # pretrain joint layout: 1 + num_negatives positives
        pw = torch.tensor([nc / 3 - 1.0])
        lt = F.binary_cross_entropy_with_logits(
            out["traj"].view(bs, nc), z, pos_weight=pw)
        loss = lv + ll + lr_ + lt
        ref_losses.append(float(loss))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()

    # ---- our loop --------------------------------------------------------- #
    import jax
    cfg = _flagship_cfg(**_no_dropout(dict(
        ranking=True, traj_judge=True, masked_vision=True,
        masked_language=True)))
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    params, missing, _ = state_dict_to_params(init_state, cfg, params)
    assert not missing

    run_args = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                         masked_language=True, pretrain=True,
                         learning_rate=LR, num_epochs=1,
                         warmup_proportion=0.2, cooldown_factor=2.25,
                         weight_decay=1e-2, num_negatives=2)
    state, tx, _ = ts.create_train_state(params, run_args,
                                         steps_per_epoch=10)
    step = jax.jit(ts.build_train_step(cfg, run_args, tx))

    shape2 = lambda x: np.asarray(x).reshape(
        (bs, nc) + np.asarray(x).shape[1:])
    batch = dict(
        instr_tokens=shape2(tokens_m).astype(np.int32),
        instr_mask=shape2(t_mask).astype(np.int32),
        segment_ids=np.zeros((bs, nc, s_t), np.int32),
        instr_targets=shape2(instr_targets).astype(np.int32),
        image_features=shape2(feats_m),
        image_locations=shape2(locs),
        image_mask=shape2(v_mask).astype(np.int32),
        image_targets=shape2(image_targets),
        image_targets_mask=shape2(image_targets_mask).astype(np.int32),
        opt_mask=np.ones((bs, nc), bool),
        ranking_target=ranking_target.astype(np.int32),
    )

    our_losses = []
    for i in range(N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        our_losses.append(float(metrics["loss/train"]))
    return our_losses, ref_losses


def test_flagship_width_loss_trajectory(rng):
    """3 full optimizer steps at flagship widths: losses must match the
    reference stack step for step (f32, dropout off, masking precomputed).
    Vision seq reduced to 96 — the width-dependent math (12/8/8-head
    attention layouts, 1601-way KL head, 30522-way tied MLM decoder,
    AdamW over the real parameter groups) is independent of seq length."""
    our_losses, ref_losses = _run_loss_trajectory(rng, bs=2, nc=7, s_t=60,
                                                  s_v=96, n_steps=3)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3,
                               err_msg=f"ours={our_losses} ref={ref_losses}")
    assert our_losses[-1] < our_losses[0]


def test_flagship_width_bwd_at_real_vision_extent(rng):
    """VERDICT r4 #5: the backward + AdamW chain at the kernels' REAL
    operating point (s_v=808 region attention), not only s_v=96.  Two
    optimizer steps: step 1's loss pins the forward at 808 (redundantly
    with the all-heads test), step 2's loss depends on every gradient and
    optimizer update from step 1 — a loss-level fingerprint of the full
    bwd at real extent.  bs=1 keeps the torch-side 808-attention residuals
    (~150 MB/layer) affordable on this box."""
    our_losses, ref_losses = _run_loss_trajectory(rng, bs=1, nc=7, s_t=60,
                                                  s_v=808, n_steps=2)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3,
                               err_msg=f"ours={our_losses} ref={ref_losses}")
