"""Golden-value tests: our jax losses vs the reference torch formulas.

The oracle is computed with torch.nn.functional exactly as
``utils/utils_init.py:108-164`` does (including pad_packed -inf padding,
KLDiv masking/normalization, CE ignore_index=-1, BCE pos_weight).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from youtube_vln_tpu.training import losses as L


def torch_pad_packed(t, mask):
    mask = mask.bool()
    out = mask.clone().to(t.dtype)
    out[mask] = t
    out[~mask] = -float("inf")
    return out


def test_pad_packed_matches(rng):
    bs, nc = 4, 7
    opt = np.ones((bs, nc), bool)
    opt[2, 5:] = False
    dense = rng.normal(size=(bs, nc)).astype(np.float32)
    packed = torch.from_numpy(dense[opt])
    ref = torch_pad_packed(packed, torch.from_numpy(opt)).numpy()
    ours = np.asarray(L.pad_packed(dense, opt))
    np.testing.assert_array_equal(ours, ref)


def test_vision_loss(rng):
    n, s, c = 6, 10, 23
    pred = rng.normal(size=(n, s, c)).astype(np.float32)
    target = rng.random((n, s, c)).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    tmask = (rng.random((n, s)) < 0.2).astype(np.float32)
    row_mask = np.array([1, 1, 1, 1, 0, 0], np.float32)

    # reference: predictions/target flattened over REAL rows only
    sel = row_mask.astype(bool)
    p_t = torch.from_numpy(pred[sel]).flatten(0, 1)
    t_t = torch.from_numpy(target[sel]).flatten(0, 1)
    m_t = torch.from_numpy(tmask[sel]).flatten()
    loss = F.kl_div(F.log_softmax(p_t, dim=-1), t_t, reduction="none")
    loss = loss * m_t.unsqueeze(-1)
    numel = max(1, int(m_t.sum().item()))
    ref = (loss.sum() / numel).item()

    ours = float(L.masked_vision_loss(pred, target, tmask, row_mask))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_vision_loss_no_masked_regions():
    n, s, c = 2, 4, 5
    pred = np.zeros((n, s, c), np.float32)
    target = np.full((n, s, c), 1 / c, np.float32)
    tmask = np.zeros((n, s), np.float32)
    assert float(L.masked_vision_loss(pred, target, tmask,
                                      np.ones(n, np.float32))) == 0.0


def test_language_loss(rng):
    n, s, v = 5, 12, 50
    pred = rng.normal(size=(n, s, v)).astype(np.float32)
    target = rng.integers(-1, v, size=(n, s))
    row_mask = np.array([1, 1, 1, 0, 0], np.float32)

    sel = row_mask.astype(bool)
    ref = F.cross_entropy(
        torch.from_numpy(pred[sel]).view(-1, v),
        torch.from_numpy(target[sel]).view(-1),
        ignore_index=-1).item()
    ours = float(L.masked_language_loss(pred, target, row_mask))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_ranking_train(rng):
    bs, nc = 4, 7
    opt = np.ones((bs, nc), bool)
    dense = rng.normal(size=(bs, nc)).astype(np.float32)
    target = np.array([0, 3, -1, 2])

    pred = torch_pad_packed(torch.from_numpy(dense[opt]),
                            torch.from_numpy(opt))
    ref_loss = F.cross_entropy(pred, torch.from_numpy(target),
                               ignore_index=-1).item()
    ref_correct = torch.sum(
        torch.argmax(pred, 1) == torch.from_numpy(target)).float().item()

    loss, correct = L.ranking_loss_train(dense, opt, target)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    assert float(correct) == ref_correct


def test_ranking_train_with_padding(rng):
    bs, nc = 3, 5
    opt = np.ones((bs, nc), bool)
    opt[1, 3:] = False
    dense = rng.normal(size=(bs, nc)).astype(np.float32)
    target = np.array([1, 2, 0])
    pred = torch_pad_packed(torch.from_numpy(dense[opt]),
                            torch.from_numpy(opt))
    ref = F.cross_entropy(pred, torch.from_numpy(target),
                          ignore_index=-1).item()
    loss, _ = L.ranking_loss_train(dense, opt, target)
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_ranking_eval(rng):
    bs, nc = 3, 30
    opt = np.ones((bs, nc), bool)
    dense = rng.normal(size=(bs, nc)).astype(np.float32)
    target = (rng.random((bs, nc)) < 0.2).astype(np.float32)

    pred = torch_pad_packed(torch.from_numpy(dense[opt]),
                            torch.from_numpy(opt))
    ref_loss = F.binary_cross_entropy_with_logits(
        pred, torch.from_numpy(target)).item()
    ref_correct = torch.sum(torch.from_numpy(target).gather(
        1, torch.argmax(pred, 1).view(-1, 1))).item()

    loss, correct = L.ranking_loss_eval(dense, opt, target)
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    assert float(correct) == pytest.approx(ref_correct)


@pytest.mark.parametrize("pretrain,ranking,num_neg,nc", [
    (True, True, 2, 7),    # pretrain joint: first 1+2 positive
    (False, True, 2, 6),   # finetune joint: all but last 2 positive
    (True, False, 2, 5),   # traj-only: first positive
])
def test_traj_judge(rng, pretrain, ranking, num_neg, nc):
    bs = 4
    opt = np.ones((bs, nc), bool)
    dense = rng.normal(size=(bs, nc)).astype(np.float32)

    target = np.zeros((bs, nc), bool)
    if not ranking:
        target[:, 0] = 1
    elif pretrain:
        target[:, :1 + num_neg] = 1
    else:
        target[:, :-num_neg] = 1

    pred = torch_pad_packed(torch.from_numpy(dense[opt]),
                            torch.from_numpy(opt))
    tt = torch.from_numpy(target)
    pos_weight = torch.tensor([target.shape[1] / target[0].sum() - 1.0])
    ref_loss = F.binary_cross_entropy_with_logits(
        pred, tt.float(), pos_weight=pos_weight).item()
    ref_correct = (torch.sum((pred.sigmoid() > 0.5) == tt).float()
                   / target.shape[1]).item()

    target_row = L.traj_judge_targets(
        nc, ranking_or_no_judge_data=ranking, pretrain=pretrain,
        num_negatives=num_neg)
    np.testing.assert_array_equal(np.asarray(target_row), target[0])
    loss, correct = L.traj_judge_loss(dense, opt, np.asarray(target_row))
    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    assert float(correct) == pytest.approx(ref_correct, rel=1e-5)


def test_sparse_vision_loss_equals_dense(rng):
    """The sparse masked-region encoding must reproduce the dense KL loss
    exactly (same RNG draws -> same masking)."""
    import numpy as np
    from youtube_vln_tpu.ops.masking import (randomize_regions_np,
                                             randomize_regions_sparse_np)
    from youtube_vln_tpu.training.losses import (masked_vision_loss,
                                                 masked_vision_loss_sparse)

    n, s, c = 6, 40, 23
    feats = rng.normal(size=(n, s, 8)).astype(np.float32)
    probs = rng.random((n, s, c)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    mask = np.ones((n, s), np.int32)
    pred = rng.normal(size=(n, s, c)).astype(np.float32)
    row_mask = np.array([1, 1, 1, 1, 0, 0], np.float32)

    f1, targets, tmask1 = randomize_regions_np(
        feats, probs, mask, np.random.default_rng(3))
    f2, idx, rows, tmask2 = randomize_regions_sparse_np(
        feats, probs, mask, np.random.default_rng(3))
    np.testing.assert_array_equal(f1, f2)          # same feature zeroing
    np.testing.assert_array_equal(tmask1, tmask2)  # same mask flags

    dense = float(masked_vision_loss(pred, targets, tmask1, row_mask))
    sparse = float(masked_vision_loss_sparse(pred, idx, rows, row_mask))
    assert sparse == pytest.approx(dense, rel=1e-5)


def test_sparse_task_heads_equal_dense(rng):
    """sparse_task_heads gathers target positions before the MLM / vision
    decoders (parallel/train_step.py:loss_fn); every task loss must equal
    the dense-head computation exactly."""
    import jax
    from youtube_vln_tpu.config import tiny_config, RunConfig
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.ops.masking import (max_masked_regions,
                                             randomize_regions_sparse_np)
    from youtube_vln_tpu.parallel import train_step as ts

    cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    bs, nc, s_t, s_v = 2, 3, 12, 10

    probs = rng.random((bs * nc, s_v, cfg.v_target_size)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    feats = rng.normal(size=(bs * nc, s_v,
                             cfg.v_feature_size)).astype(np.float32)
    mask = np.ones((bs * nc, s_v), np.int32)
    f2, idx, rows, tmask = randomize_regions_sparse_np(
        feats.copy(), probs, mask, np.random.default_rng(3))
    m_cap = max_masked_regions(s_v)
    dense_targets = np.full_like(probs, 1.0 / cfg.v_target_size)
    for i in range(bs * nc):
        for j in range(m_cap):
            if idx[i, j] < s_v:
                dense_targets[i, idx[i, j]] = rows[i, j]

    batch = {
        "instr_tokens": rng.integers(1, cfg.vocab_size, (bs, nc, s_t)),
        "instr_mask": np.ones((bs, nc, s_t), np.int32),
        "segment_ids": np.zeros((bs, nc, s_t), np.int32),
        "instr_targets": np.where(rng.random((bs, nc, s_t)) < 0.3,
                                  rng.integers(0, cfg.vocab_size,
                                               (bs, nc, s_t)), -1),
        "image_features": f2.reshape(bs, nc, s_v, -1),
        "image_locations": rng.random((bs, nc, s_v, 12)).astype(np.float32),
        "image_mask": mask.reshape(bs, nc, s_v),
        "image_targets": rows.reshape(bs, nc, m_cap, -1),
        "image_targets_idx": idx.reshape(bs, nc, m_cap),
        "image_targets_mask": tmask.reshape(bs, nc, s_v),
        "opt_mask": np.ones((bs, nc), bool),
        "ranking_target": np.zeros((bs,), np.int32),
    }
    batch["image_locations"][..., 11] = 0
    dense_batch = dict(batch)
    dense_batch.pop("image_targets_idx")
    dense_batch["image_targets"] = dense_targets.reshape(bs, nc, s_v, -1)

    args_sparse = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                            masked_language=True, pretrain=True,
                            sparse_task_heads=True)
    args_dense = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                           masked_language=True, pretrain=True,
                           sparse_task_heads=False)

    t_sparse = ts._task_config(args_sparse, training=True)
    t_dense = ts._task_config(args_dense, training=True)
    _, m_sp = ts.loss_fn(params, cfg, batch, t_sparse, None, False)
    _, m_dn = ts.loss_fn(params, cfg, dense_batch, t_dense, None, False)
    for k in ("loss/vision", "loss/language", "loss/ranking", "loss/traj",
              "loss/train"):
        assert float(m_sp[k]) == pytest.approx(float(m_dn[k]), rel=1e-5), k


def test_losses_match_live_reference(rng):
    """Drive the ACTUAL reference get_loss_correct (utils/utils_init.py) on
    a reference-shaped 17-tuple batch and compare every task's loss AND
    correct against compute_task_losses on the dense equivalent.  The
    oracle tests above re-derive the formulas with torch.nn.functional;
    this pins them against the live reference code.  Padded rows carry
    random garbage on our side (their contribution must be masked out).
    traj is compared on the all-real batch only — with padding the
    reference averages over sigmoid(-inf) rows, which it can never
    actually produce (documented deviation, see traj_judge_loss)."""
    import sys
    from types import SimpleNamespace
    from conftest import import_reference_common

    import_reference_common()
    from utils import utils_init as ref_ui

    from youtube_vln_tpu.training.losses import compute_task_losses

    bs, nc, s_t, s_v, C, V = 3, 5, 7, 6, 11, 50
    args_stub = SimpleNamespace(ranking=True, not_traj_judge_data=False,
                                pretrain=True, num_negatives=1)

    for padded, training in ((False, True), (False, False), (True, True)):
        opt = np.ones((bs, nc), bool)
        if padded:
            opt[0, -1] = opt[2, -2:] = False
        n_real = int(opt.sum())

        vision_real = rng.normal(size=(n_real, s_v, C)).astype(np.float32)
        language_real = rng.normal(size=(n_real, s_t, V)).astype(np.float32)
        ranking_real = rng.normal(size=(n_real, 1)).astype(np.float32)
        traj_real = rng.normal(size=(n_real, 1)).astype(np.float32)

        img_targets = rng.dirichlet(np.ones(C), size=(bs, nc, s_v)
                                    ).astype(np.float32)
        img_tmask = (rng.random((bs, nc, s_v)) < 0.3).astype(np.int64)
        instr_targets = np.where(rng.random((bs, nc, s_t)) < 0.2,
                                 rng.integers(0, V, (bs, nc, s_t)),
                                 -1).astype(np.int64)
        if training:
            rank_target = rng.integers(0, nc, (bs,)).astype(np.int64)
        else:
            rank_target = (rng.random((bs, nc)) < 0.4).astype(np.float32)

        batch17 = [None] * 17
        batch17[0] = torch.from_numpy(rank_target)
        batch17[1] = torch.zeros((bs, nc, s_v, 4))
        batch17[4] = torch.from_numpy(img_targets)
        batch17[5] = torch.from_numpy(img_tmask)
        batch17[8] = torch.from_numpy(instr_targets)
        batch17[13] = torch.from_numpy(opt)

        ref_outputs = {
            "vision": torch.from_numpy(vision_real),
            "language": torch.from_numpy(language_real),
            "ranking": torch.from_numpy(ranking_real),
            "traj": torch.from_numpy(traj_real),
        }
        ref_vals = {}
        for task in ("vision", "language", "ranking", "traj"):
            _, _, loss, correct = ref_ui.get_loss_correct(
                batch17, ref_outputs, task, args_stub, None, training)
            ref_vals[task] = (float(loss), float(correct))

        # dense layout: scatter the real rows, garbage elsewhere
        def scatter(real, tail_shape):
            dense = rng.normal(size=(bs * nc,) + tail_shape
                               ).astype(np.float32)
            dense[opt.reshape(-1)] = real
            return dense

        outputs = {
            "vision": scatter(vision_real, (s_v, C)),
            "language": scatter(language_real, (s_t, V)),
            "ranking": scatter(ranking_real, (1,)),
            "traj": scatter(traj_real, (1,)),
        }
        batch = dict(
            opt_mask=opt, ranking_target=rank_target,
            image_targets=img_targets.reshape(bs * nc, s_v, C),
            image_targets_mask=img_tmask.reshape(bs * nc, s_v),
            instr_targets=instr_targets.reshape(bs * nc, s_t))
        tasks = dict(ranking=True, traj_judge=not padded,
                     masked_vision=True, masked_language=True,
                     pretrain=True, num_negatives=1, traj_loss_scale=1.0,
                     not_traj_judge_data=False, training=training)
        _, metrics = compute_task_losses(outputs, batch, tasks)

        for task, key in (("vision", "loss/vision"),
                          ("language", "loss/language"),
                          ("ranking", "loss/ranking")):
            np.testing.assert_allclose(float(metrics[key]),
                                       ref_vals[task][0], rtol=2e-5,
                                       err_msg=f"{task} {padded} {training}")
        np.testing.assert_allclose(float(metrics["correct/ranking"]),
                                   ref_vals["ranking"][1], rtol=1e-6)
        if not padded:
            np.testing.assert_allclose(float(metrics["loss/traj"]),
                                       ref_vals["traj"][0], rtol=2e-5)
            np.testing.assert_allclose(float(metrics["correct/traj"]),
                                       ref_vals["traj"][1], rtol=1e-6)
