"""Flagship-geometry SPMD compile smoke, shared by the test suite and the
driver artifact.

``flagship_geometry_compile(mesh)`` compiles — without executing — the
FULL train step (all four task losses + backward + reference AdamW) at the
reference's real geometry (hidden 768/1024, 60 text tokens, 808 visual
regions = 8 steps x 101 boxes, 12/8/8 heads, 30522-way vocab, 1601-way
vision head, 7 candidates) with the Pallas kernels force-selected, and
asserts the data/model shardings introduce ZERO all-gathers.

Reduced vs the real model: DEPTH only (2 text / 1 vision / 1 cross layer —
per-shard block shapes don't depend on depth) and dropout=0 (the CPU
interpreter cannot lower the on-core PRNG; dropout branches are covered
on-chip by scripts/check_kernels_tpu.py).

One implementation on purpose: ``tests/test_flagship_shapes.py`` pins it
per-commit and ``__graft_entry__.dryrun_multichip`` records it in the
driver's ``MULTICHIP_r*.json`` — two hand-synced copies would let the
batch-transport key set or the kernel-selection contract drift apart and
the artifact would silently pin a stale geometry.

Reference geometry anchors: /root/reference/utils/cli.py:146-162,
vilbert/vilbert.py:129-171.
"""
import jax
import jax.numpy as jnp

from ..config import RunConfig, lily_base_config
from ..models import init_lily_params
from ..ops.attention import (pallas_attention_core, pallas_bi_attention,
                             use_pallas_for)
from . import train_step as ts
from .mesh import param_shardings, shard_params


def forced_attention_fn(q, k, v, mask, *, dropout_rate=0.0, rng=None,
                        train=False):
    """Pallas wherever the kernels' shape gate admits, XLA otherwise —
    bypassing the platform gate so the per-shard kernel lowering runs on
    the CPU interpreter (the gate would silently fall back to XLA and the
    compile would prove nothing about the kernels)."""
    from ..models.layers import attention_core
    if use_pallas_for(q.shape[2], k.shape[2], q.shape[3]):
        return pallas_attention_core(q, k, v, mask,
                                     dropout_rate=dropout_rate, rng=rng,
                                     train=train)
    return attention_core(q, k, v, mask, dropout_rate=dropout_rate,
                          rng=rng, train=train)


def flagship_geometry_compile(mesh, *, dedup=True, bs=None):
    """Lower + compile the full train step at flagship geometry over
    ``mesh`` ({data, model} axes) and assert zero all-gathers in the HLO.
    ``dedup`` selects the candidate-dedup batch transport (the default
    layout) vs the dense per-candidate one.  Returns the compiled
    executable."""
    from ..ops import attention as attn_mod
    from ..ops.masking import max_masked_regions

    cfg = lily_base_config(
        ranking=True, traj_judge=True, masked_vision=True,
        masked_language=True, use_pallas_attention=True,
        compute_dtype="bfloat16",
        # depth-only reduction; all widths/seq-lens/head-counts are real
        num_hidden_layers=2, v_num_hidden_layers=1,
        v_biattention_id=(0,), t_biattention_id=(1,),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
    args = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                     masked_language=True, pretrain=True,
                     learning_rate=2e-5, num_epochs=1,
                     gradient_accumulation_steps=1,
                     sparse_vision_targets=True, dedup_candidates=dedup)

    saved = (attn_mod.select_attention_fn, attn_mod.select_bi_attention_fn)
    attn_mod.select_attention_fn = (
        lambda cfg, platform=None: forced_attention_fn)
    attn_mod.select_bi_attention_fn = (
        lambda cfg, platform=None: pallas_bi_attention)
    try:
        params = init_lily_params(jax.random.PRNGKey(0), cfg)
        params = shard_params(params, param_shardings(mesh, params, cfg))
        state, tx, _ = ts.create_train_state(params, args,
                                             steps_per_epoch=10)
        step = jax.jit(ts.build_train_step(cfg, args, tx),
                       donate_argnums=(0,))

        nc, s_t, s_v = 7, 60, 808
        bs = mesh.shape["data"] if bs is None else bs  # 1 sample/shard
        m_cap = max_masked_regions(s_v)
        batch_shapes = {
            "instr_tokens": ((bs, nc, s_t), jnp.int32),
            "instr_mask": ((bs, nc, s_t), jnp.int32),
            "segment_ids": ((bs, nc, s_t), jnp.int32),
            "instr_targets": ((bs, nc, s_t), jnp.int32),
            "image_targets": ((bs, nc, m_cap, cfg.v_target_size),
                              jnp.float32),
            "image_targets_idx": ((bs, nc, m_cap), jnp.int32),
            "image_targets_mask": ((bs, nc, s_v), jnp.int32),
            "opt_mask": ((bs, nc), jnp.bool_),
            "ranking_target": ((bs,), jnp.int32),
        }
        if dedup:
            n_u = nc - 2  # positive + 2 caption-negatives share rows
            batch_shapes.update({
                "uniq_image_features": ((bs, n_u, s_v, 2048), jnp.float32),
                "uniq_image_locations": ((bs, n_u, s_v, 12), jnp.float32),
                "uniq_image_mask": ((bs, n_u, s_v), jnp.int32),
                "cand_index": ((bs, nc), jnp.int32),
                "feature_zero_mask": ((bs, nc, s_v), jnp.uint8),
            })
        else:
            batch_shapes.update({
                "image_features": ((bs, nc, s_v, 2048), jnp.float32),
                "image_locations": ((bs, nc, s_v, 12), jnp.float32),
                "image_mask": ((bs, nc, s_v), jnp.int32),
            })
        template = {k: jnp.zeros(s, d) for k, (s, d) in batch_shapes.items()}
        bshard = ts.make_batch_shardings(mesh, template)
        abstract_batch = {
            k: jax.ShapeDtypeStruct(template[k].shape, template[k].dtype,
                                    sharding=bshard[k])
            for k in template}

        # compile-only: this runs the custom_partitioning per-shard
        # lowering (and therefore the Pallas BlockSpec construction) at
        # flagship shapes
        compiled = step.lower(state, abstract_batch,
                              jax.random.PRNGKey(1)).compile()
        text = compiled.as_text()
        assert "all-gather" not in text, (
            "flagship-shape sharding re-introduced gathers around the "
            "kernels")
        return compiled
    finally:
        attn_mod.select_attention_fn, attn_mod.select_bi_attention_fn = saved
