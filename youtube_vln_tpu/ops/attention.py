"""Fused attention kernels (Pallas/Mosaic, TPU).

Replaces the unfused QK^T -> +mask -> softmax -> dropout -> PV chain
(reference ``vilbert/vilbert.py:284-311`` and both directions of
``BertBiAttention``, :552-618) with a single kernel that never materializes
the [S_q, S_kv] probability matrix in HBM.  The backward pass recomputes
probabilities blockwise (flash-attention style), so no attention residuals
are stored — this is what lets the 808-token vision stream train without
global rematerialization.

Key facts for these workloads: S_kv <= 808 and head_dim in {64, 128}, so a
whole (S_q, S_kv) tile fits VMEM per (batch*head) program — no online
softmax needed; scores/probs live only on-chip.

Dropout uses the on-core PRNG; the backward kernel reseeds identically and
regenerates the same mask, matching torch's dropout-on-probs semantics
(train mode scales by 1/keep).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partition import sharded_lead_call


def _interpret() -> bool:
    # run kernels through the Pallas interpreter off-TPU (CPU test meshes)
    return jax.default_backend() not in ("tpu", "axon")


def _dropout_mask(shape, rate: float):
    """Bernoulli keep-mask from the seeded on-core PRNG."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, rowid_ref, q_ref, k_ref, v_ref, bias_ref, out_ref,
                *, scale: float, dropout_rate: float):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, s_kv) broadcast
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        # seed by GLOBAL row id (not program_id): under SPMD partitioning
        # each shard restarts program_id at 0, which would replay the same
        # masks on every chip; rowid is sharded with the data
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + _my_row_id(rowid_ref))
        keep = _dropout_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, rowid_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float,
                dropout_rate: float):
    # recompute probabilities exactly as the forward did
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, s_kv) broadcast
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + _my_row_id(rowid_ref))
        keep = _dropout_mask(p.shape, dropout_rate)
        p_drop = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        p_drop = p

    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # dV = P~^T dO
    dv_ref[0] = jax.lax.dot_general(
        p_drop, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dP~ = dO V^T ; undo dropout scaling/mask
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
    # softmax vjp: dS = P o (dP - rowsum(P o dP))
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    ds = ds * scale
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(s_q, s_kv, d):
    qspec = pl.BlockSpec((1, s_q, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, s_kv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # key-side additive bias, one row per (batch*head) program
    bspec = pl.BlockSpec((1, 1, s_kv), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


def _row_ids(n: int):
    """Global row ids [n, 1] i32 for the epilogue kernels' (8, 1) VMEM
    row-id blocks (ops/epilogue.py)."""
    return jnp.arange(n, dtype=jnp.int32).reshape(n, 1)


def _row_ids2(b: int, h: int):
    """Global (batch, head) dropout-stream ids [B, H] i32.

    Rides a scalar-prefetch (SMEM) operand: the attention kernels read
    their own id with a dynamic ``program_id`` index, so ids need NOT be
    consecutive within a shard — under tensor parallelism a shard owns a
    strided subset of heads.  (The earlier (8, 1) VMEM block recovered ids
    as block_base + program_id % 8, which silently assumed consecutive
    ids and would replay/skew masks under a sharded head axis.)  Values
    equal the flattened (b * H + h) order, so single-chip mask streams
    are unchanged."""
    return jnp.arange(b * h, dtype=jnp.int32).reshape(b, h)


def _my_row_id(rowid_ref):
    return rowid_ref[pl.program_id(0)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention(q, k, v, bias, seed, dropout_rate, train):
    out, _ = _fused_attention_fwd(q, k, v, bias, seed, dropout_rate, train)
    return out


def _seed_arr(seed):
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _draw_seed(rng):
    """Full-int32-range dropout seed carried as an int32 scalar-prefetch
    operand.  (An earlier revision rode the seed through a float32 operand
    capped at 2^23 to survive f32 quantization; the shrunken seed space gave
    ~7e-5/step birthday-collision odds across the ~50 dropout sites — two
    sites drawing identical mask streams for overlapping row ids.)"""
    return jax.random.randint(rng, (), jnp.iinfo(jnp.int32).min,
                              jnp.iinfo(jnp.int32).max, dtype=jnp.int32)


def _seed_zero_cotangent(seed):
    # integer primals carry float0 tangents under custom_vjp
    return np.zeros(np.shape(seed), dtype=jax.dtypes.float0)


def _run_fwd(q, k, v, bias, dropout_rate, seed):

    def call(seed_arr, rowid, q, k, v, bias):
        # everything static is derived from the (possibly per-shard) shapes
        bh, s_q, d = q.shape
        s_kv = k.shape[1]
        qspec, kspec, bspec = _specs(s_q, s_kv, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # seed [1] + global row ids [bh]
            grid=(bh,),
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=qspec,
        )
        kernel = functools.partial(_fwd_kernel, scale=1.0 / math.sqrt(d),
                                   dropout_rate=dropout_rate)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * s_q * s_kv * d,
                bytes_accessed=2 * bh * (s_q + s_kv) * d * q.dtype.itemsize,
                transcendentals=bh * s_q * s_kv),
            interpret=_interpret(),
        )(seed_arr, rowid, q, k, v, bias)

    # lead=2: batch AND head dims keep their mesh sharding (data + model
    # parallel); the flatten to [bh, s, d] happens on per-shard shapes
    return sharded_lead_call(
        call, (_seed_arr(seed), _row_ids2(*q.shape[:2]), q, k, v, bias),
        out_ranks=(4,), lead=2)


def _fused_attention_fwd(q, k, v, bias, seed, dropout_rate, train):
    rate = dropout_rate if train else 0.0
    out = _run_fwd(q, k, v, bias, rate, seed)
    return out, (q, k, v, bias, seed)


def _fused_attention_bwd(dropout_rate, train, residuals, do):
    q, k, v, bias, seed = residuals
    rate = dropout_rate if train else 0.0

    def call(seed_arr, rowid, q, k, v, bias, do):
        bh, s_q, d = q.shape
        s_kv = k.shape[1]
        qspec, kspec, bspec = _specs(s_q, s_kv, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh,),
            in_specs=[qspec, kspec, kspec, bspec, qspec],
            out_specs=(qspec, kspec, kspec),
        )
        kernel = functools.partial(_bwd_kernel, scale=1.0 / math.sqrt(d),
                                   dropout_rate=rate)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct(k.shape, k.dtype),
                       jax.ShapeDtypeStruct(v.shape, v.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=11 * bh * s_q * s_kv * d,
                bytes_accessed=5 * bh * (s_q + s_kv) * d * q.dtype.itemsize,
                transcendentals=bh * s_q * s_kv),
            interpret=_interpret(),
        )(seed_arr, rowid, q, k, v, bias, do)

    dq, dk, dv = sharded_lead_call(
        call, (_seed_arr(seed), _row_ids2(*q.shape[:2]), q, k, v, bias, do),
        out_ranks=(4, 4, 4), lead=2)
    return dq, dk, dv, jnp.zeros_like(bias), _seed_zero_cotangent(seed)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def pallas_attention_core(q, k, v, mask, *, dropout_rate: float = 0.0,
                          rng: Optional[jax.Array] = None,
                          train: bool = False):
    """Drop-in replacement for models.layers.attention_core.

    q,k,v: [B, H, S, D]; mask: additive bias broadcastable to
    [B, H, S_q, S_kv] (the model passes [B, 1, 1, S_kv]).
    """
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    if mask is None:
        bias = jnp.zeros((b, s_kv), jnp.float32)
    else:
        assert mask.shape[1] == 1 and mask.shape[2] == 1, (
            "fused attention supports key-side masks [B,1,1,S_kv]; got "
            f"{mask.shape}")
        bias = mask.astype(jnp.float32).reshape(b, s_kv)
    # tiny per-(batch,head) copy ([B, H, 1, S_kv] f32) so the kernel index
    # map stays trivial; rank-4 (not pre-flattened) so the head dim keeps
    # its mesh sharding through the custom_partitioning boundary
    bias = jnp.broadcast_to(bias[:, None, None, :], (b, h, 1, s_kv))

    if train and dropout_rate > 0.0 and rng is not None:
        seed = _draw_seed(rng)
    else:
        seed = jnp.zeros((), jnp.int32)
        dropout_rate = 0.0

    # operands stay [B, H, s, d]: merging an unsharded batch dim with a
    # model-sharded head dim has no GSPMD representation (it forces
    # head-dim all-gathers); the per-shard lowering flattens locally
    return _fused_attention(q, k, v, bias, seed, float(dropout_rate),
                            bool(train))


# --------------------------------------------------------------------------- #
# fused bi-directional cross attention (both directions of BertBiAttention
# in ONE kernel launch; reference vilbert/vilbert.py:552-618)
# --------------------------------------------------------------------------- #
def _bi_fwd_kernel(seed_ref, rowid_ref, q1_ref, k1_ref, v1_ref, q2_ref,
                   k2_ref, v2_ref, vbias_ref, tbias_ref, ctx1_ref, ctx2_ref,
                   *, scale: float, rate1: float, rate2: float):
    """Per (batch*head) program:
         ctx1 = softmax(q2 k1^T + vbias) v1   (text queries -> vision KV)
         ctx2 = softmax(q1 k2^T + tbias) v2   (vision queries -> text KV)
    Dropout draws two masks from one seeded stream; the backward kernel
    replays the identical call order."""
    if rate1 > 0.0 or rate2 > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + _my_row_id(rowid_ref))

    s1 = jax.lax.dot_general(
        q2_ref[0], k1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s1 = s1 + vbias_ref[0].astype(jnp.float32)
    p1 = jax.nn.softmax(s1, axis=-1)
    if rate1 > 0.0:
        keep1 = _dropout_mask(p1.shape, rate1)
        p1 = jnp.where(keep1, p1 / (1.0 - rate1), 0.0)
    ctx1_ref[0] = jax.lax.dot_general(
        p1.astype(v1_ref.dtype), v1_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ctx1_ref.dtype)

    s2 = jax.lax.dot_general(
        q1_ref[0], k2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s2 = s2 + tbias_ref[0].astype(jnp.float32)
    p2 = jax.nn.softmax(s2, axis=-1)
    if rate2 > 0.0:
        keep2 = _dropout_mask(p2.shape, rate2)
        p2 = jnp.where(keep2, p2 / (1.0 - rate2), 0.0)
    ctx2_ref[0] = jax.lax.dot_general(
        p2.astype(v2_ref.dtype), v2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ctx2_ref.dtype)


def _bi_bwd_kernel(seed_ref, rowid_ref, q1_ref, k1_ref, v1_ref, q2_ref,
                   k2_ref, v2_ref, vbias_ref, tbias_ref, do1_ref, do2_ref,
                   dq1_ref, dk1_ref, dv1_ref, dq2_ref, dk2_ref, dv2_ref, *,
                   scale: float, rate1: float, rate2: float):
    if rate1 > 0.0 or rate2 > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + _my_row_id(rowid_ref))

    # ---- direction 1: recompute p1, then dV1 / dQ2 / dK1 ----
    s1 = jax.lax.dot_general(
        q2_ref[0], k1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s1 = s1 + vbias_ref[0].astype(jnp.float32)
    p1 = jax.nn.softmax(s1, axis=-1)
    if rate1 > 0.0:
        keep1 = _dropout_mask(p1.shape, rate1)
        p1_drop = jnp.where(keep1, p1 / (1.0 - rate1), 0.0)
    else:
        p1_drop = p1
    do1 = do1_ref[0].astype(jnp.float32)
    v1 = v1_ref[0].astype(jnp.float32)
    dv1_ref[0] = jax.lax.dot_general(
        p1_drop, do1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv1_ref.dtype)
    dp1 = jax.lax.dot_general(
        do1, v1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate1 > 0.0:
        dp1 = jnp.where(keep1, dp1 / (1.0 - rate1), 0.0)
    ds1 = p1 * (dp1 - jnp.sum(p1 * dp1, axis=-1, keepdims=True)) * scale
    q2 = q2_ref[0].astype(jnp.float32)
    k1 = k1_ref[0].astype(jnp.float32)
    dq2_ref[0] = jax.lax.dot_general(
        ds1, k1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq2_ref.dtype)
    dk1_ref[0] = jax.lax.dot_general(
        ds1, q2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk1_ref.dtype)

    # ---- direction 2 (same seeded stream order as the forward) ----
    s2 = jax.lax.dot_general(
        q1_ref[0], k2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s2 = s2 + tbias_ref[0].astype(jnp.float32)
    p2 = jax.nn.softmax(s2, axis=-1)
    if rate2 > 0.0:
        keep2 = _dropout_mask(p2.shape, rate2)
        p2_drop = jnp.where(keep2, p2 / (1.0 - rate2), 0.0)
    else:
        p2_drop = p2
    do2 = do2_ref[0].astype(jnp.float32)
    v2 = v2_ref[0].astype(jnp.float32)
    dv2_ref[0] = jax.lax.dot_general(
        p2_drop, do2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv2_ref.dtype)
    dp2 = jax.lax.dot_general(
        do2, v2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate2 > 0.0:
        dp2 = jnp.where(keep2, dp2 / (1.0 - rate2), 0.0)
    ds2 = p2 * (dp2 - jnp.sum(p2 * dp2, axis=-1, keepdims=True)) * scale
    q1 = q1_ref[0].astype(jnp.float32)
    k2 = k2_ref[0].astype(jnp.float32)
    dq1_ref[0] = jax.lax.dot_general(
        ds2, k2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq1_ref.dtype)
    dk2_ref[0] = jax.lax.dot_general(
        ds2, q1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk2_ref.dtype)


def _bi_specs(s_v, s_t, d):
    vspec = pl.BlockSpec((1, s_v, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, s_t, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vbspec = pl.BlockSpec((1, 1, s_v), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    tbspec = pl.BlockSpec((1, 1, s_t), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return vspec, tspec, vbspec, tbspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_bi_attention(q1, k1, v1, q2, k2, v2, vbias, tbias, seed,
                        rate1, rate2, train):
    out, _ = _fused_bi_attention_fwd(q1, k1, v1, q2, k2, v2, vbias, tbias,
                                     seed, rate1, rate2, train)
    return out


def _fused_bi_attention_fwd(q1, k1, v1, q2, k2, v2, vbias, tbias, seed,
                            rate1, rate2, train):
    if not train:
        rate1 = rate2 = 0.0

    def call(seed_arr, rowid, q1, k1, v1, q2, k2, v2, vbias, tbias):
        bh, s_v, d = q1.shape
        s_t = q2.shape[1]
        vspec, tspec, vbspec, tbspec = _bi_specs(s_v, s_t, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh,),
            in_specs=[vspec, vspec, vspec, tspec, tspec, tspec,
                      vbspec, tbspec],
            out_specs=(tspec, vspec),
        )
        kernel = functools.partial(_bi_fwd_kernel, scale=1.0 / math.sqrt(d),
                                   rate1=rate1, rate2=rate2)
        # 2 matmuls per direction x 2 directions = 4 [s_t,d]x[d,s_v]
        # matmuls at 2 flops/MAC (the single-direction kernel's 4x covers
        # only one direction)
        flops = 8 * bh * s_t * s_v * d
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((bh, s_t, d), q2.dtype),
                       jax.ShapeDtypeStruct((bh, s_v, d), q1.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=8 * bh * (s_v + s_t) * d * q1.dtype.itemsize,
                transcendentals=2 * bh * s_t * s_v),
            interpret=_interpret(),
        )(seed_arr, rowid, q1, k1, v1, q2, k2, v2, vbias, tbias)

    ctx1, ctx2 = sharded_lead_call(
        call, (_seed_arr(seed), _row_ids2(*q1.shape[:2]),
               q1, k1, v1, q2, k2, v2, vbias, tbias),
        out_ranks=(4, 4), lead=2)
    return (ctx1, ctx2), (q1, k1, v1, q2, k2, v2, vbias, tbias, seed)


def _fused_bi_attention_bwd(rate1, rate2, train, residuals, dout):
    q1, k1, v1, q2, k2, v2, vbias, tbias, seed = residuals
    do1, do2 = dout
    if not train:
        rate1 = rate2 = 0.0

    def call(seed_arr, rowid, q1, k1, v1, q2, k2, v2, vbias, tbias,
             do1, do2):
        bh, s_v, d = q1.shape
        s_t = q2.shape[1]
        vspec, tspec, vbspec, tbspec = _bi_specs(s_v, s_t, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh,),
            in_specs=[vspec, vspec, vspec, tspec, tspec, tspec,
                      vbspec, tbspec, tspec, vspec],
            out_specs=(vspec, vspec, vspec, tspec, tspec, tspec),
        )
        kernel = functools.partial(_bi_bwd_kernel, scale=1.0 / math.sqrt(d),
                                   rate1=rate1, rate2=rate2)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(q1.shape, q1.dtype),
                       jax.ShapeDtypeStruct(k1.shape, k1.dtype),
                       jax.ShapeDtypeStruct(v1.shape, v1.dtype),
                       jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                       jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                       jax.ShapeDtypeStruct(v2.shape, v2.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                # ~5 matmuls per direction x 2 directions (the
                # single-direction bwd charges 11x for its one direction)
                flops=22 * bh * s_t * s_v * d,
                bytes_accessed=14 * bh * (s_v + s_t) * d * q1.dtype.itemsize,
                transcendentals=2 * bh * s_t * s_v),
            interpret=_interpret(),
        )(seed_arr, rowid, q1, k1, v1, q2, k2, v2, vbias, tbias, do1, do2)

    grads = sharded_lead_call(
        call, (_seed_arr(seed), _row_ids2(*q1.shape[:2]),
               q1, k1, v1, q2, k2, v2, vbias, tbias, do1, do2),
        out_ranks=(4, 4, 4, 4, 4, 4), lead=2)
    dq1, dk1, dv1, dq2, dk2, dv2 = grads
    return (dq1, dk1, dv1, dq2, dk2, dv2,
            jnp.zeros_like(vbias), jnp.zeros_like(tbias),
            _seed_zero_cotangent(seed))


_fused_bi_attention.defvjp(_fused_bi_attention_fwd, _fused_bi_attention_bwd)


def pallas_bi_attention(q1, k1, v1, q2, k2, v2, v_mask, t_mask, *,
                        rate1: float = 0.0, rate2: float = 0.0,
                        rng: Optional[jax.Array] = None,
                        train: bool = False):
    """Both directions of BertBiAttention in one launch.

    q1/k1/v1: vision-stream projections [B, H, S_v, D]; q2/k2/v2 text
    [B, H, S_t, D]; masks additive [B, 1, 1, S].  Returns
    (ctx1 [B, H, S_t, D], ctx2 [B, H, S_v, D]) matching the unfused
    two-call formulation in models/vilbert.py:bi_attention.
    """
    b, h, s_v, d = q1.shape
    s_t = q2.shape[2]

    def key_bias(mask, s):
        if mask is None:
            bias = jnp.zeros((b, s), jnp.float32)
        else:
            assert mask.shape[1] == 1 and mask.shape[2] == 1, mask.shape
            bias = mask.astype(jnp.float32).reshape(b, s)
        # rank-4 (not pre-flattened) so the head dim keeps its mesh
        # sharding through the custom_partitioning boundary
        return jnp.broadcast_to(bias[:, None, None, :], (b, h, 1, s))

    vbias = key_bias(v_mask, s_v)
    tbias = key_bias(t_mask, s_t)

    if train and (rate1 > 0.0 or rate2 > 0.0) and rng is not None:
        seed = _draw_seed(rng)
    else:
        seed = jnp.zeros((), jnp.int32)
        rate1 = rate2 = 0.0

    # operands stay [B, H, s, d]; the per-shard lowering flattens locally
    return _fused_bi_attention(
        q1, k1, v1, q2, k2, v2,
        vbias, tbias, seed, float(rate1), float(rate2), bool(train))


def select_bi_attention_fn(cfg, platform: Optional[str] = None):
    """Returns a fused bi-attention fn for models.vilbert.bi_attention, or
    None to keep the two-call path (XLA or per-direction Pallas)."""
    if not getattr(cfg, "use_pallas_attention", False):
        return None
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return None
    return pallas_bi_attention


def use_pallas_for(s_q: int, s_kv: int, d: int) -> bool:
    """Heuristic: the fused kernel pays off whenever the score matrix is
    big enough to matter (vision self-attention and both cross directions);
    only the tiny text self-attention stays on the XLA path."""
    return s_q * s_kv >= 4096 and d in (64, 128)


def select_attention_fn(cfg, platform: Optional[str] = None):
    """Returns an attention_fn for models.vilbert (or None for pure XLA)."""
    if not getattr(cfg, "use_pallas_attention", False):
        return None
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return None

    from ..models.layers import attention_core

    def fn(q, k, v, mask, *, dropout_rate=0.0, rng=None, train=False):
        if use_pallas_for(q.shape[2], k.shape[2], q.shape[3]):
            return pallas_attention_core(q, k, v, mask,
                                         dropout_rate=dropout_rate, rng=rng,
                                         train=train)
        return attention_core(q, k, v, mask, dropout_rate=dropout_rate,
                              rng=rng, train=train)

    return fn
