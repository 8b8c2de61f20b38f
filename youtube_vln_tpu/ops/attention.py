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


def _interpret() -> bool:
    # run kernels through the Pallas interpreter off-TPU (CPU test meshes)
    return jax.default_backend() not in ("tpu", "axon")


def _dropout_mask(shape, rate: float):
    """Bernoulli keep-mask from the seeded on-core PRNG."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = np.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                scale: float, dropout_rate: float):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, s_kv) broadcast
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + pl.program_id(0))
        keep = _dropout_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float,
                dropout_rate: float):
    # recompute probabilities exactly as the forward did
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0].astype(jnp.float32)  # (1, s_kv) broadcast
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + pl.program_id(0))
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


def _specs(s_q, s_kv, d, num_heads):
    qspec = pl.BlockSpec((1, s_q, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, s_kv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    # key-side additive bias, one row per (batch*head) program
    del num_heads
    bspec = pl.BlockSpec((1, 1, s_kv), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention(q, k, v, bias, seed, dropout_rate, train, num_heads):
    out, _ = _fused_attention_fwd(q, k, v, bias, seed, dropout_rate, train,
                                  num_heads)
    return out


def _seed_arr(seed):
    return jnp.asarray(seed, jnp.float32).reshape(1)


def _run_fwd(q, k, v, bias, dropout_rate, seed, num_heads):
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    qspec, kspec, bspec = _specs(s_q, s_kv, d, num_heads)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
    )(_seed_arr(seed), q, k, v, bias)


def _fused_attention_fwd(q, k, v, bias, seed, dropout_rate, train,
                         num_heads):
    rate = dropout_rate if train else 0.0
    out = _run_fwd(q, k, v, bias, rate, seed, num_heads)
    return out, (q, k, v, bias, seed)


def _fused_attention_bwd(dropout_rate, train, num_heads, residuals, do):
    q, k, v, bias, seed = residuals
    rate = dropout_rate if train else 0.0
    bh, s_q, d = q.shape
    s_kv = k.shape[1]
    qspec, kspec, bspec = _specs(s_q, s_kv, d, num_heads)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh,),
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=(qspec, kspec, kspec),
    )
    kernel = functools.partial(_bwd_kernel, scale=1.0 / math.sqrt(d),
                               dropout_rate=rate)
    dq, dk, dv = pl.pallas_call(
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
    )(_seed_arr(seed), q, k, v, bias, do)
    return dq, dk, dv, jnp.zeros_like(bias), jnp.zeros_like(seed)


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
    # tiny per-(batch,head) copy ([B*H, S_kv] f32) so the kernel index map
    # stays trivial
    bias = jnp.repeat(bias, h, axis=0).reshape(b * h, 1, s_kv)

    if train and dropout_rate > 0.0 and rng is not None:
        seed = jax.random.randint(rng, (), 0,
                                  np.iinfo(np.int32).max).astype(jnp.float32)
    else:
        seed = jnp.zeros((), jnp.float32)
        dropout_rate = 0.0

    qf = q.reshape(b * h, s_q, d)
    kf = k.reshape(b * h, s_kv, d)
    vf = v.reshape(b * h, s_kv, d)
    out = _fused_attention(qf, kf, vf, bias, seed, float(dropout_rate),
                           bool(train), h)
    return out.reshape(b, h, s_q, d)


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
