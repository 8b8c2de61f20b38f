"""The jitted train/eval steps.

One XLA executable per phase: forward + all task losses + backward +
reference-AdamW update + in-graph metrics.  Equivalents of the reference
machinery:

  * DDP gradient all-reduce (utils/distributed.py:97-104)  -> GSPMD psum
    inserted by XLA for replicated params vs data-sharded batch
  * eager metric all_reduce (utils_init.py:177-183)        -> metrics are
    global values by construction (computed on the global sharded batch)
  * gradient accumulation (utils_init.py:230-239)          -> lax.scan over
    a leading microbatch axis inside the same executable
  * scheduler.step per optimizer step                      -> schedule
    indexed by the in-state step counter

Batch layout (produced by data/loader.py), leading dim sharded over "data":

  instr_tokens   [B, nc, S_t] i32     image_features     [B, nc, S_v, 2048]
  instr_mask     [B, nc, S_t] i32     image_locations    [B, nc, S_v, 12]
  segment_ids    [B, nc, S_t] i32     image_mask         [B, nc, S_v] i32
  instr_targets  [B, nc, S_t] i32     image_targets      [B, nc, S_v, C]
  opt_mask       [B, nc] bool         image_targets_mask [B, nc, S_v] i32
  ranking_target [B] i32 (train) / [B, nc] f32 multi-hot (eval)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import LilyConfig, RunConfig
from ..models import lily_forward
from ..training import losses as losses_lib
from ..training.optimization import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, args: RunConfig, steps_per_epoch: int):
    tx, schedule = make_optimizer(args, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx, schedule


def _expand_dedup(batch: Dict[str, jnp.ndarray]):
    """Candidate-dedup transport -> per-candidate visual arrays.

    The loader ships each unique trajectory's visual rows once
    (``uniq_image_*`` [B, n_u, ...]) plus ``cand_index`` [B, nc]; the
    gather-expand runs here, on device, so the duplicated rows never
    cross H2D or the host collate (datasets.py:_finalize dedup branch).
    ``feature_zero_mask`` applies the MVM 90%-of-masked feature zeroing
    (ops/masking.py:randomize_regions_sparse_dedup_np) to the expanded
    copies — per candidate, exactly as the dense path corrupts its
    per-candidate copies on the host."""
    if "uniq_image_features" not in batch:
        return batch
    idx = batch["cand_index"]  # [B, nc] int32

    def gather(x):
        full_idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, full_idx.astype(jnp.int32), axis=1)

    feats = gather(batch["uniq_image_features"])
    if "feature_zero_mask" in batch:
        keep = (batch["feature_zero_mask"] == 0)[..., None]
        feats = feats * keep.astype(feats.dtype)
    out = dict(batch)
    out["image_features"] = feats
    out["image_locations"] = gather(batch["uniq_image_locations"])
    out["image_mask"] = gather(batch["uniq_image_mask"])
    for k in ("uniq_image_features", "uniq_image_locations",
              "uniq_image_mask", "cand_index", "feature_zero_mask"):
        out.pop(k, None)   # consumed — mirror expand_beam_steps
    return out


def expand_beam_steps(batch: Dict[str, jnp.ndarray]):
    """--dedup_beam_steps transport -> dense per-beam visual arrays.

    The loader ships each unique (viewpoint, heading, step) pano block
    once (``uniq_step_*`` [B, n_u, boxes, ...]) plus ``step_index``
    [B, nc, L]; the gather-expand runs here, on device, so the repeated
    blocks never cross H2D (datasets.py:_dedup_step_features — eval beams
    are a search tree over one graph neighborhood, reference
    all_dataset.py:981-1041, and share most steps)."""
    if "uniq_step_features" not in batch:
        return batch
    idx = batch["step_index"].astype(jnp.int32)      # [B, nc, L]
    bs, nc, L = idx.shape

    def gather(x):                                    # [B, n_u, boxes, ...]
        boxes = x.shape[2]
        fi = idx.reshape((bs, nc * L) + (1,) * (x.ndim - 2))
        out = jnp.take_along_axis(x, fi, axis=1)
        return out.reshape((bs, nc, L * boxes) + x.shape[3:])

    out = dict(batch)
    out["image_features"] = gather(batch["uniq_step_features"])
    out["image_locations"] = gather(batch["uniq_step_locations"])
    out["image_mask"] = gather(batch["uniq_step_mask"])
    for k in ("uniq_step_features", "uniq_step_locations",
              "uniq_step_mask", "step_index"):
        del out[k]
    return out


def _flatten_candidates(batch: Dict[str, jnp.ndarray]):
    """[B, nc, ...] -> [B*nc, ...] for the model inputs."""
    def flat(x):
        return x.reshape((-1,) + x.shape[2:])
    return {k: flat(batch[k]) for k in
            ("instr_tokens", "instr_mask", "segment_ids", "image_features",
             "image_locations", "image_mask")}


def _task_config(args: RunConfig, training: bool) -> Dict[str, Any]:
    # action-word masking (--mask_action_rate) can push the per-row masked
    # count past the static sparse-head cap; fall back to the dense MLM
    # head there (the vision cap is unaffected — region masking stays at
    # the 15% ladder)
    sparse_heads = getattr(args, "sparse_task_heads", False) and \
        getattr(args, "mask_action_rate", 0.0) == 0.0
    return dict(ranking=args.ranking, traj_judge=args.traj_judge,
                masked_vision=args.masked_vision,
                masked_language=args.masked_language,
                pretrain=args.pretrain, num_negatives=args.num_negatives,
                traj_loss_scale=args.traj_loss_scale,
                not_traj_judge_data=args.not_traj_judge_data,
                sparse_task_heads=sparse_heads,
                sparse_vision_head=getattr(args, "sparse_task_heads", False),
                training=training)


# static cap on target-carrying text positions per row: the 15% ladder
# masks ~0.15*S_t in expectation; 32 of 60 is >8 sigma of headroom (same
# reasoning as ops/masking.py:max_masked_regions)
MAX_LANGUAGE_TARGETS = 32


def fast_dropout_key(key):
    """Re-wrap a threefry key as an ``rbg`` key (XLA RngBitGenerator).

    Dropout-mask generation with threefry costs ~120 ms/step at the
    flagship geometry (~32% of the step, measured on v5e); the hardware
    generator removes almost all of it.  RNG parity with the reference is
    statistical by policy (torch CPU RNG differs anyway), so the dropout
    mask distribution is all that matters.  No-op for keys that are
    already rbg."""
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        impl = str(jax.random.key_impl(key))
        if "rbg" in impl:
            return key
        data = jax.random.key_data(key)
    else:  # raw uint32 key array (legacy PRNGKey)
        data = key
    data = data.reshape(-1)
    rbg_data = jnp.concatenate([data, data])[:4].astype(jnp.uint32)
    return jax.random.wrap_key_data(rbg_data, impl="rbg")


def loss_fn(params, cfg: LilyConfig, batch, tasks, rng, train: bool):
    batch = expand_beam_steps(_expand_dedup(batch))
    flat = _flatten_candidates(batch)
    instr_targets = _merge01(batch["instr_targets"])
    sparse_heads = tasks.get("sparse_task_heads", False)

    lang_idx = vis_idx = None
    if sparse_heads and tasks["masked_language"]:
        m = min(instr_targets.shape[1], MAX_LANGUAGE_TARGETS)
        # target-carrying positions first (stable: ties keep position order)
        lang_idx = jnp.argsort(instr_targets < 0, axis=1,
                               stable=True)[:, :m]
        instr_targets = jnp.take_along_axis(instr_targets, lang_idx, axis=1)
    if (tasks.get("sparse_vision_head", sparse_heads)
            and tasks["masked_vision"]
            and "image_targets_idx" in batch):
        s_v = flat["image_mask"].shape[1]
        # padding sentinel == s_v; clamp for the gather, the loss keeps the
        # raw indices for validity
        vis_idx = jnp.minimum(_merge01(batch["image_targets_idx"]), s_v - 1)

    outputs = lily_forward(
        params, cfg,
        flat["instr_tokens"], flat["image_features"], flat["image_locations"],
        token_type_ids=flat["segment_ids"], attention_mask=flat["instr_mask"],
        image_attention_mask=flat["image_mask"], rng=rng, train=train,
        language_target_idx=lang_idx, vision_target_idx=vis_idx)
    loss_batch = dict(opt_mask=batch["opt_mask"],
                      ranking_target=batch["ranking_target"],
                      instr_targets=instr_targets,
                      num_regions=flat["image_mask"].shape[1])
    if "image_targets" in batch:
        # absent when the masked-vision task is globally off — the
        # dataset skips shipping the (large) target block entirely
        loss_batch["image_targets"] = _merge01(batch["image_targets"])
        loss_batch["image_targets_mask"] = _merge01(
            batch["image_targets_mask"])
    if "image_targets_idx" in batch:
        loss_batch["image_targets_idx"] = _merge01(batch["image_targets_idx"])
        loss_batch["vision_pre_gathered"] = vis_idx is not None
    return losses_lib.compute_task_losses(outputs, loss_batch, tasks)


def _merge01(x):
    return x.reshape((-1,) + x.shape[2:])


def build_train_step(cfg: LilyConfig, args: RunConfig, tx):
    """Returns step(state, batch, rng) -> (state, metrics).

    When args.gradient_accumulation_steps > 1 the batch must carry a leading
    microbatch axis [A, B/A(local), ...]; gradients are averaged over A
    before one optimizer update, matching loss/accum + backward-accumulate
    semantics (utils_init.py:230-239).
    """
    tasks = _task_config(args, training=True)
    accum = args.gradient_accumulation_steps
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_microbatch(params, mb, rng):
        rng = fast_dropout_key(rng)
        (loss, metrics), grads = grad_fn(params, cfg, mb, tasks, rng, True)
        return loss, metrics, grads

    def step(state: TrainState, batch, rng):
        if accum > 1:
            def scan_body(carry, mb_rng):
                mb, r = mb_rng
                _, metrics, grads = one_microbatch(state.params, mb, r)
                g_acc, m_acc = carry
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
                return (g_acc, m_acc), None

            rngs = jax.random.split(rng, accum)
            mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
            _, metrics0, grads0 = one_microbatch(state.params, mb0, rngs[0])
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, metrics), _ = jax.lax.scan(
                scan_body, (grads0, metrics0),
                (rest, rngs[1:]))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            # loss/* are per-microbatch MEANS -> average them; correct/*
            # are COUNTS -> keep the sum, so a step's logged count covers
            # the same row total whatever the accumulation factor
            metrics = {k: (v / accum if k.startswith("loss/") else v)
                       for k, v in metrics.items()}
        else:
            _, metrics, grads = one_microbatch(state.params, batch, rng)

        apply = getattr(tx, "apply", None)
        if apply is not None:
            # fused one-pass update (optimization.py:adamw_ref.apply) —
            # the optax delta route costs ~2x the optimizer's HBM
            # speed-of-light on 250M params
            params, opt_state = apply(grads, state.opt_state, state.params)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(jnp.add, state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def build_eval_step(cfg: LilyConfig, args: RunConfig, training_loss=False):
    """Returns eval_step(params, batch) -> metrics (loss/correct per task).

    The default training_loss=False matches both test_epoch and val_epoch,
    which route through get_loss_correct(training=False)
    (utils_init.py:306-312, 382-410)."""
    tasks = _task_config(args, training=training_loss)

    def eval_step(params, batch):
        _, metrics = loss_fn(params, cfg, batch, tasks, None, False)
        return metrics

    return eval_step


def jit_train_step(step_fn, mesh, state_shardings, batch_shardings):
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def make_batch_shardings(mesh, batch_template):
    """Leading dim over 'data'; with accumulation, axis 0 is the microbatch
    axis and axis 1 is sharded instead."""
    def spec(x):
        nd = x.ndim
        return NamedSharding(mesh, P("data", *([None] * (nd - 1))))
    return jax.tree_util.tree_map(spec, batch_template)


def make_accum_batch_shardings(mesh, batch_template):
    def spec(x):
        nd = x.ndim
        return NamedSharding(mesh, P(None, "data", *([None] * (nd - 2))))
    return jax.tree_util.tree_map(spec, batch_template)
