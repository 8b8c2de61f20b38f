"""Fused dropout+residual+LayerNorm epilogue (Pallas/Mosaic, TPU).

Every transformer sub-block in the reference ends with
``LayerNorm(dropout(h) + residual)`` (BertSelfOutput/BertOutput/BertBiOutput,
reference ``vilbert/vilbert.py:313-337,355-368,620-650``).  Under XLA the
dropout mask is materialized in HBM between fusions (RngBitGenerator output
plus the select), which costs ~2 bytes/element/site across the 24 large
vision-stream sites — measured at ~23 ms of the 268 ms train step.  This
kernel draws the mask from the on-core PRNG instead, so the only HBM
traffic is one read of ``h`` and the residual and one write of the output;
the backward kernel reseeds the identical stream and replays the mask
(same scheme as ops/attention.py).

Numerics match models/layers.py exactly apart from the mask draws (RNG
parity with the reference is statistical by policy): dropout scale/add in
the compute dtype, LayerNorm statistics in float32, eps inside the rsqrt.
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

from .attention import (_dropout_mask, _draw_seed, _interpret, _row_ids,
                        _seed_arr, _seed_zero_cotangent)
from .partition import sharded_batch_call

LN_EPS = 1e-12

# use the fused kernel only where the mask traffic matters; the text stream
# ([B, 60, 768] ~ 2.6 M elements) stays on XLA, the vision stream
# ([B, 808, 1024] ~ 46 M elements) goes through the kernel
MIN_FUSED_ELEMENTS = 1 << 22


def _epi_fwd_kernel(seed_ref, rowid_ref, h_ref, res_ref, w_ref, b_ref,
                    out_ref, *, rate: float):
    h = h_ref[...]
    if rate > 0.0:
        # seed by the GLOBAL id of the block's first row (not program_id):
        # under SPMD partitioning each shard restarts program_id at 0,
        # which would replay the same masks on every chip
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + rowid_ref[0, 0])
        keep = _dropout_mask(h.shape, rate)
        h = jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)
    y = (h + res_ref[...]).astype(jnp.float32)
    u = jnp.mean(y, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(y - u), axis=-1, keepdims=True)
    yhat = (y - u) * jax.lax.rsqrt(s + LN_EPS)
    out_ref[...] = (w_ref[...].astype(jnp.float32) * yhat
                    + b_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _epi_bwd_kernel(seed_ref, rowid_ref, h_ref, res_ref, w_ref, do_ref,
                    dh_ref, dres_ref, dw_ref, db_ref, *, rate: float):
    # recompute y / LN statistics exactly as the forward did
    h = h_ref[...]
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0].astype(jnp.int32) + rowid_ref[0, 0])
        keep = _dropout_mask(h.shape, rate)
        h = jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)
    y = (h + res_ref[...]).astype(jnp.float32)
    u = jnp.mean(y, axis=-1, keepdims=True)
    s = jnp.mean(jnp.square(y - u), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(s + LN_EPS)
    yhat = (y - u) * rstd

    do = do_ref[...].astype(jnp.float32)
    dyhat = do * w_ref[...].astype(jnp.float32)
    # LN vjp: dy = rstd * (dyhat - mean(dyhat) - yhat * mean(dyhat*yhat))
    m1 = jnp.mean(dyhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dyhat * yhat, axis=-1, keepdims=True)
    dy = rstd * (dyhat - m1 - yhat * m2)
    dres_ref[...] = dy.astype(dres_ref.dtype)
    if rate > 0.0:
        dh = jnp.where(keep, dy / (1.0 - rate), 0.0)
    else:
        dh = dy
    dh_ref[...] = dh.astype(dh_ref.dtype)

    # parameter grads accumulate across the sequential TPU grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += jnp.sum(do * yhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(do, axis=0, keepdims=True)


def _row_block(n_rows: int) -> int:
    """Row-block size: a multiple of 8 (Mosaic sublane tiling; also keeps
    the (8, 1) row-id block aligned to program starts).  Callers pad the
    row dim up to a block multiple, so ANY n works — including per-shard
    row counts under SPMD partitioning, which need not divide evenly (the
    original divisor search crashed there)."""
    if n_rows >= 512:
        return 512
    return max(8, -(-n_rows // 8) * 8)


def _pad_rows(x, n_pad: int):
    n = x.shape[0]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, n_pad - n),) + ((0, 0),) * (x.ndim - 1))


def _specs(rb: int, d: int):
    xspec = pl.BlockSpec((rb, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, d), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
    # (8, 1) id block anchored at the program's first row (rb % 8 == 0, so
    # block index i*rb//8 is exact); the kernel reads [0, 0] = global id of
    # row i*rb
    rowspec = pl.BlockSpec((8, 1), lambda i, *_: (i * (rb // 8), 0),
                           memory_space=pltpu.VMEM)
    return xspec, pspec, rowspec


# NOTE: the forward and backward both derive the row-block size and
# padding from the (local) shape, so the backward replays the forward's
# exact grid — and therefore its exact per-block dropout streams — on any
# shard layout.  Padded rows are all-zero: LN of a zero row is b (finite,
# variance 0 is guarded by eps) and they are sliced off / carry zero
# cotangents, so they contribute nothing to any output or gradient.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_epilogue(h, res, w, b, seed, rate):
    out, _ = _fused_epilogue_fwd(h, res, w, b, seed, rate)
    return out


def _fused_epilogue_fwd(h, res, w, b, seed, rate):
    d = h.shape[1]

    def call(seed_arr, rowid, h, res, w, b):
        n, d = h.shape
        rb = _row_block(n)
        n_pad = -(-n // rb) * rb
        h, res, rowid = (_pad_rows(x, n_pad) for x in (h, res, rowid))
        xspec, pspec, rowspec = _specs(rb, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // rb,),
            in_specs=[rowspec, xspec, xspec, pspec, pspec],
            out_specs=xspec,
        )
        out = pl.pallas_call(
            functools.partial(_epi_fwd_kernel, rate=rate),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, d), h.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=10 * n * d,
                bytes_accessed=3 * n * d * h.dtype.itemsize,
                transcendentals=n),
            interpret=_interpret(),
        )(seed_arr, rowid, h, res, w, b)
        return out[:n]

    out = sharded_batch_call(
        call, (_seed_arr(seed), _row_ids(h.shape[0]), h, res,
               w.reshape(1, d), b.reshape(1, d)),
        out_ranks=(2,), replicated=(0, 4, 5))
    return out, (h, res, w, seed)


def _fused_epilogue_bwd(rate, residuals, do):
    h, res, w, seed = residuals
    d = h.shape[1]

    def call(seed_arr, rowid, h, res, w, do):
        n, d = h.shape
        rb = _row_block(n)
        n_pad = -(-n // rb) * rb
        # do pads with ZEROS, so padded rows add nothing to dw/db
        h, res, rowid, do = (_pad_rows(x, n_pad)
                             for x in (h, res, rowid, do))
        xspec, pspec, rowspec = _specs(rb, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // rb,),
            in_specs=[rowspec, xspec, xspec, pspec, xspec],
            out_specs=(xspec, xspec, pspec, pspec),
        )
        dh, dres, dw, db = pl.pallas_call(
            functools.partial(_epi_bwd_kernel, rate=rate),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n_pad, d), h.dtype),
                       jax.ShapeDtypeStruct((n_pad, d), res.dtype),
                       jax.ShapeDtypeStruct((1, d), jnp.float32),
                       jax.ShapeDtypeStruct((1, d), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=20 * n * d,
                bytes_accessed=5 * n * d * h.dtype.itemsize,
                transcendentals=n),
            interpret=_interpret(),
        )(seed_arr, rowid, h, res, w, do)
        return dh[:n], dres[:n], dw, db

    # dw/db are reductions over the row dim: psummed across shards
    dh, dres, dw, db = sharded_batch_call(
        call, (_seed_arr(seed), _row_ids(h.shape[0]), h, res,
               w.reshape(1, d), do),
        out_ranks=(2, 2, 2, 2), replicated=(0, 4),
        reduced_outputs=(2, 3))
    return (dh, dres, dw.reshape(w.shape).astype(w.dtype),
            db.reshape(w.shape).astype(w.dtype), _seed_zero_cotangent(seed))


_fused_epilogue.defvjp(_fused_epilogue_fwd, _fused_epilogue_bwd)


def pallas_dropout_add_ln(h, res, ln_params, *, rate: float = 0.0,
                          rng: Optional[jax.Array] = None,
                          train: bool = False):
    """LayerNorm(dropout(h) + res) in one kernel.

    h/res: [..., D] (leading dims are flattened for the row grid); ln_params
    is the {"w", "b"} dict from models/layers.py:init_layer_norm.  Returns
    None when the shape doesn't tile (caller falls back to the XLA path).
    """
    shape = h.shape
    d = shape[-1]
    n = math.prod(shape[:-1])
    if d % 128 != 0:
        return None

    if train and rate > 0.0 and rng is not None:
        seed = _draw_seed(rng)
    else:
        seed = jnp.zeros((), jnp.int32)
        rate = 0.0

    out = _fused_epilogue(h.reshape(n, d), res.reshape(n, d),
                          ln_params["w"], ln_params["b"], seed, float(rate))
    return out.reshape(shape)


def select_epilogue_fn(cfg, platform: Optional[str] = None):
    """Returns an epilogue_fn for models.layers.dropout_add_ln, or None to
    keep the unfused XLA path.  Mirrors ops.attention.select_attention_fn."""
    if not getattr(cfg, "use_pallas_attention", False):
        return None
    if not getattr(cfg, "use_pallas_epilogue", False):
        return None
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return None

    from ..models.layers import dropout, layer_norm

    def fn(h, res, ln_params, rate, rng, train):
        # mask traffic only matters at scale, and only the train path draws
        # a mask — eval add+LN fuses fine under XLA
        if train and rate > 0.0 and rng is not None \
                and h.size >= MIN_FUSED_ELEMENTS:
            out = pallas_dropout_add_ln(h, res, ln_params, rate=rate,
                                        rng=rng, train=train)
            if out is not None:
                return out
        return layer_norm(dropout(h, rate, rng, train) + res, ln_params)

    return fn
