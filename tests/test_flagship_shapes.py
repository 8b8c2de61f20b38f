"""Flagship-geometry multi-device compile smoke (VERDICT r2, weak #3).

tests/test_parallel.py proves the sharded train step at tiny_config;
shape-dependent GSPMD/custom_partitioning regressions (e.g. the (8, 1)
row-id BlockSpec in ops/attention.py interacting with per-shard bh) only
surface at real widths.  This compiles — without executing — the FULL
train step on a 2-device data mesh at the reference's real geometry
(hidden 768/1024, 60 text tokens, 808 visual regions, 1601-way targets,
12/8/8 heads, 7 candidates) with the Pallas kernels force-selected, so
the per-shard kernel lowering runs at flagship shapes.

Reduced vs the real model: DEPTH only (2 text / 1 vision / 1 cross layer
— per-shard block shapes don't depend on depth) and dropout=0 (the CPU
interpreter cannot lower the on-core PRNG; dropout branches are covered
on-chip by scripts/check_kernels_tpu.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtube_vln_tpu.config import lily_base_config, RunConfig
from youtube_vln_tpu.models import init_lily_params
from youtube_vln_tpu.ops.attention import (pallas_attention_core,
                                           pallas_bi_attention,
                                           use_pallas_for)
from youtube_vln_tpu.parallel import train_step as ts
from youtube_vln_tpu.parallel.mesh import (make_mesh, param_shardings,
                                           shard_params)


def _forced_attention_fn(q, k, v, mask, *, dropout_rate=0.0, rng=None,
                         train=False):
    from youtube_vln_tpu.models.layers import attention_core
    if use_pallas_for(q.shape[2], k.shape[2], q.shape[3]):
        return pallas_attention_core(q, k, v, mask,
                                     dropout_rate=dropout_rate, rng=rng,
                                     train=train)
    return attention_core(q, k, v, mask, dropout_rate=dropout_rate,
                          rng=rng, train=train)


@pytest.mark.parametrize(
    "mesh_shape,dedup",
    [((2, 1), False), ((2, 1), True), ((2, 2), False)],
    ids=["dp2-dense", "dp2-dedup", "dp2xtp2-dense"])
def test_flagship_geometry_compiles_on_two_device_mesh(monkeypatch,
                                                       mesh_shape, dedup):
    """dp2xtp2: VERDICT r3 weak #1 — Megatron column/row param shardings
    plus the kernels' lead=2 (batch, head) custom_partitioning contract at
    the REAL head counts (12/8/8).  Under TP the attention operands are
    [B, H, s, d] with H sharded on 'model'; without the rank-4 boundary
    (ops/partition.py:sharded_lead_call) XLA inserts 20 head-dim
    all-gathers at this geometry."""
    n_dev = int(np.prod(mesh_shape))
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >={n_dev} devices")

    # force-select the Pallas kernels despite the CPU backend (the
    # platform gate would otherwise fall back to XLA and prove nothing)
    from youtube_vln_tpu.ops import attention as attn_mod
    monkeypatch.setattr(attn_mod, "select_attention_fn",
                        lambda cfg, platform=None: _forced_attention_fn)
    monkeypatch.setattr(attn_mod, "select_bi_attention_fn",
                        lambda cfg, platform=None: pallas_bi_attention)

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
                     sparse_vision_targets=True,
                     dedup_candidates=dedup)

    mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, param_shardings(mesh, params, cfg))
    state, tx, _ = ts.create_train_state(params, args, steps_per_epoch=10)
    step = jax.jit(ts.build_train_step(cfg, args, tx), donate_argnums=(0,))

    from youtube_vln_tpu.ops.masking import max_masked_regions
    bs, nc, s_t, s_v = 2, 7, 60, 808  # one sample per shard
    m_cap = max_masked_regions(s_v)
    batch_shapes = {
        "instr_tokens": ((bs, nc, s_t), jnp.int32),
        "instr_mask": ((bs, nc, s_t), jnp.int32),
        "segment_ids": ((bs, nc, s_t), jnp.int32),
        "instr_targets": ((bs, nc, s_t), jnp.int32),
        "image_targets": ((bs, nc, m_cap, cfg.v_target_size), jnp.float32),
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

    # compile-only: this runs the custom_partitioning per-shard lowering
    # (and therefore the Pallas BlockSpec construction) at flagship shapes
    compiled = step.lower(state, abstract_batch,
                          jax.random.PRNGKey(1)).compile()
    text = compiled.as_text()
    assert "all-gather" not in text, (
        "flagship-shape sharding re-introduced gathers around the kernels")
