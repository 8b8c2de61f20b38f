"""Task losses, bit-matched to the reference (``utils/utils_init.py:108-164``).

Layout difference from the reference (deliberate, TPU-first): the reference
gathers real candidates out of the batch before the forward pass
(``get_model_input``, utils_init.py:34-77) and scatters logits back with
``pad_packed`` (common.py:21-26).  We keep static shapes end to end: the
model runs on all ``bs*num_cand`` rows (padding included) and ``opt_mask``
[bs, num_cand] weights them inside the loss.  Loss values match exactly
because padded rows contribute nothing in either formulation.

All reductions run in float32.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def pad_packed(logits: jnp.ndarray, opt_mask: jnp.ndarray) -> jnp.ndarray:
    """Dense analogue of reference ``pad_packed``: -inf at padded candidates.

    ``logits``: [bs, num_cand] (already dense), ``opt_mask``: [bs, num_cand].
    """
    return jnp.where(opt_mask, logits.astype(jnp.float32), NEG_INF)


def _xlogy(x, y):
    """x * log(y) with 0*log(0) = 0 (torch F.kl_div convention)."""
    return jnp.where(x == 0.0, 0.0, x * jnp.log(jnp.where(x == 0.0, 1.0, y)))


def masked_vision_loss(predictions, targets, target_mask, row_mask):
    """KLDiv(log_softmax(pred), target) masked and normalized by the count of
    masked regions (reference utils_init.py:117-128).

    predictions: [N, S_v, C] raw logits; targets: [N, S_v, C] distributions;
    target_mask: [N, S_v] 1 where the region was masked; row_mask: [N] 1 for
    real (non-padding) candidates.
    """
    logp = jax.nn.log_softmax(predictions.astype(jnp.float32), axis=-1)
    t = targets.astype(jnp.float32)
    kl = _xlogy(t, t) - t * logp                      # torch: t*(log t - logp)
    w = (target_mask.astype(jnp.float32)
         * row_mask.astype(jnp.float32)[:, None])[..., None]
    numel = jnp.maximum(1.0, jnp.sum(w[..., 0]))
    return jnp.sum(kl * w) / numel


def masked_language_loss(predictions, targets, row_mask):
    """Cross entropy with ignore_index=-1 (reference utils_init.py:129-135).

    predictions: [N, S_t, V]; targets: [N, S_t] with -1 = ignore;
    row_mask: [N].
    """
    logp = jax.nn.log_softmax(predictions.astype(jnp.float32), axis=-1)
    valid = (targets >= 0) & (row_mask[:, None] > 0)
    safe_t = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.sum(valid.astype(jnp.float32))
    # torch returns nan when every target is ignored; we return 0 instead
    # (only reachable when masked_language is on but no token was masked).
    return jnp.sum(nll) / jnp.maximum(count, 1.0)


def ranking_loss_train(logits, opt_mask, target):
    """CE over candidates with ignore_index=-1 + argmax accuracy
    (reference utils_init.py:136-141).

    logits: [bs, num_cand] dense; target: [bs] int (-1 = ignore).
    Returns (loss, correct_count).
    """
    pred = pad_packed(logits, opt_mask)
    logp = jax.nn.log_softmax(pred, axis=-1)
    valid = target >= 0
    safe_t = jnp.where(valid, target, 0)
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=1)[:, 0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    correct = jnp.sum((jnp.argmax(pred, axis=1) == target).astype(jnp.float32))
    return loss, correct


def _bce_with_logits(x, z, pos_weight=None):
    """torch.nn.functional.binary_cross_entropy_with_logits, elementwise.

    l = (1 + (pw-1)z) * [log(1+exp(-|x|)) + max(-x, 0)] ... using the stable
    torch formulation: l = (1-z)x + (1 + (pw-1)z) * log(1 + exp(-x)) computed
    stably.
    """
    x = x.astype(jnp.float32)
    z = z.astype(jnp.float32)
    log_weight = 1.0 if pos_weight is None else (1.0 + (pos_weight - 1.0) * z)
    # log(1 + exp(-x)) stable: max(-x, 0) + log1p(exp(-|x|))
    softplus_neg = jnp.maximum(-x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return (1.0 - z) * x + log_weight * softplus_neg


def ranking_loss_eval(logits, opt_mask, target):
    """BCE-with-logits vs multi-hot success + top-1 success gather
    (reference utils_init.py:142-146; val_epoch utils_init.py:399-410).

    target: [bs, num_cand] multi-hot float/bool.  Padded candidates are
    excluded from the mean (the reference never feeds padding here because
    eval tiles beams to exactly num_beams, all_dataset.py:782-784).
    Returns (loss, correct_count).
    """
    m = opt_mask.astype(jnp.float32)
    pred = jnp.where(opt_mask, logits.astype(jnp.float32), 0.0)
    bce = _bce_with_logits(pred, target.astype(jnp.float32)) * m
    loss = jnp.sum(bce) / jnp.maximum(jnp.sum(m), 1.0)
    top = jnp.argmax(pad_packed(logits, opt_mask), axis=1)
    correct = jnp.sum(jnp.take_along_axis(
        target.astype(jnp.float32), top[:, None], axis=1))
    return loss, correct


def traj_judge_targets(num_cand: int, *, ranking_or_no_judge_data: bool,
                       pretrain: bool, num_negatives: int) -> jnp.ndarray:
    """Position-dependent target layout (reference utils_init.py:149-158).

    Known deviation (intentional, degenerate-config-only): at
    ``num_negatives=0`` in the fine-tune ranking branch the reference
    writes ``target[:, :-0] = 1`` — a ``[:0]`` no-op slice, so EVERY
    candidate stays labeled negative and ``pos_weight = nc/pos - 1``
    divides by zero (inf -> NaN loss on the first step).  With zero
    shuffled negatives every candidate is an unshuffled real path, so the
    semantically-correct target is all-positive: ``idx < nc - 0`` here.
    Safe superset: the reference config cannot train at all on this flag
    combination (also listed in MIGRATION.md)."""
    idx = jnp.arange(num_cand)
    if not ranking_or_no_judge_data:
        return (idx == 0)
    if pretrain:
        return idx < (1 + num_negatives)
    return idx < (num_cand - num_negatives)


def traj_judge_loss(logits, opt_mask, target_row):
    """BCE-with-logits with pos_weight = negatives/positives computed from
    the first row (reference utils_init.py:160-162).

    logits: [bs, num_cand]; target_row: [num_cand] bool (same for each batch
    row, as in the reference).  Returns (loss, correct_count).

    Known deviation (intentional, padding-only): the reference computes
    both the BCE mean and ``correct`` over ALL nc candidates of
    ``pad_packed`` output — a padded candidate contributes sigmoid(-inf)=0,
    which counts as "correct" against its False target, and would be an
    infinite loss against a True target.  We exclude padded candidates via
    opt_mask instead (mask-weighted mean, masked correct count).  The
    reference never actually feeds padding here (pretrain items always
    carry the full candidate set and targets are a positive PREFIX, so a
    padded tail with a True target cannot occur) — on every reference-
    reachable batch the two forms are equal.
    """
    bs, nc = logits.shape
    z = jnp.broadcast_to(target_row.astype(jnp.float32)[None, :], (bs, nc))
    pos = jnp.sum(target_row.astype(jnp.float32))
    pos_weight = nc / pos - 1.0
    m = opt_mask.astype(jnp.float32)
    pred = jnp.where(opt_mask, logits.astype(jnp.float32), 0.0)
    bce = _bce_with_logits(pred, z, pos_weight) * m
    loss = jnp.sum(bce) / jnp.maximum(jnp.sum(m), 1.0)
    correct = jnp.sum(((jax.nn.sigmoid(pred) > 0.5) == (z > 0.5))
                      .astype(jnp.float32) * m) / nc
    return loss, correct


def compute_task_losses(outputs: Dict[str, jnp.ndarray], batch: Dict,
                        cfg_tasks: Dict) -> Tuple[jnp.ndarray, Dict]:
    """Sum enabled task losses exactly as train_epoch does
    (reference utils_init.py:192-239): vision + language + ranking +
    traj_loss_scale * traj.

    ``outputs`` come from lily_forward on the flattened [bs*nc, ...] batch.
    ``batch`` is a dict with dense arrays (see data/loader.py):
      opt_mask [bs, nc], ranking_target, image_targets, image_targets_mask,
      instr_targets.
    ``cfg_tasks``: dict(ranking=, traj_judge=, masked_vision=,
      masked_language=, pretrain=, num_negatives=, traj_loss_scale=,
      not_traj_judge_data=, training=).
    Returns (total_loss, metrics dict of per-task loss/accuracy pieces).
    """
    opt_mask = batch["opt_mask"]
    bs, nc = opt_mask.shape
    row_mask = opt_mask.reshape(-1)
    metrics: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)

    if cfg_tasks["masked_vision"]:
        if "image_targets_idx" in batch:
            loss = masked_vision_loss_sparse(
                outputs["vision"], batch["image_targets_idx"],
                batch["image_targets"], row_mask,
                pre_gathered=batch.get("vision_pre_gathered", False),
                num_regions=batch.get("num_regions"))
        else:
            loss = masked_vision_loss(outputs["vision"],
                                      batch["image_targets"],
                                      batch["image_targets_mask"], row_mask)
        metrics["loss/vision"] = loss
        total = total + loss
    if cfg_tasks["masked_language"]:
        loss = masked_language_loss(outputs["language"],
                                    batch["instr_targets"], row_mask)
        metrics["loss/language"] = loss
        total = total + loss
    if cfg_tasks["ranking"]:
        logits = outputs["ranking"].reshape(bs, nc)
        if cfg_tasks["training"]:
            loss, correct = ranking_loss_train(logits, opt_mask,
                                               batch["ranking_target"])
        else:
            loss, correct = ranking_loss_eval(logits, opt_mask,
                                              batch["ranking_target"])
        metrics["loss/ranking"] = loss
        metrics["correct/ranking"] = correct
        total = total + loss
    if cfg_tasks["traj_judge"]:
        logits = outputs["traj"].reshape(bs, nc)
        # train and eval share one layout: the reference's get_loss_correct
        # routes traj through the same branch either way (the pretrain test
        # split scores the frozen testset identically, utils_init.py:147-162)
        target_row = traj_judge_targets(
            nc,
            ranking_or_no_judge_data=(cfg_tasks["ranking"]
                                      or cfg_tasks["not_traj_judge_data"]),
            pretrain=cfg_tasks["pretrain"],
            num_negatives=cfg_tasks["num_negatives"])
        loss, correct = traj_judge_loss(logits, opt_mask, target_row)
        metrics["loss/traj"] = loss
        metrics["correct/traj"] = correct
        total = total + cfg_tasks["traj_loss_scale"] * loss

    # reference logs loss/train as the UNSCALED sum of task losses
    # (utils_init.py:226-228) while backprop uses traj_loss_scale
    metrics["loss/train"] = sum(
        (v for k, v in metrics.items() if k.startswith("loss/")),
        jnp.zeros((), jnp.float32))
    return total, metrics


def masked_vision_loss_sparse(predictions, target_idx, target_rows,
                              row_mask, *, pre_gathered: bool = False,
                              num_regions: int = None):
    """Sparse form of masked_vision_loss: only masked regions carry targets.

    predictions: [N, S_v, C] — or, with ``pre_gathered`` (the model already
    ran its head on the gathered rows, models/vilbert.py:lily_forward),
    [N, M, C] aligned with ``target_idx``.  target_idx: [N, M]
    (``num_regions``/S_v = padding sentinel); target_rows: [N, M, C];
    row_mask: [N].  Equals the dense loss exactly because unmasked regions
    contribute 0 there (weight mask), so only the gathered rows matter.
    log_softmax runs on M<<S_v rows.
    """
    if pre_gathered:
        assert num_regions is not None
        s_v = num_regions
        pred_rows = predictions.astype(jnp.float32)
        valid = (target_idx < s_v) & (row_mask[:, None] > 0)
    else:
        n, s_v, c = predictions.shape
        valid = (target_idx < s_v) & (row_mask[:, None] > 0)
        safe_idx = jnp.where(valid, target_idx, 0)
        pred_rows = jnp.take_along_axis(
            predictions.astype(jnp.float32), safe_idx[..., None], axis=1)
    logp = jax.nn.log_softmax(pred_rows, axis=-1)
    t = target_rows.astype(jnp.float32)
    kl = _xlogy(t, t) - t * logp
    w = valid.astype(jnp.float32)[..., None]
    numel = jnp.maximum(1.0, jnp.sum(w[..., 0]))
    return jnp.sum(kl * w) / numel
