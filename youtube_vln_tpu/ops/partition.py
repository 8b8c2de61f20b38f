"""GSPMD partitioning for the fused Pallas kernels.

``pl.pallas_call`` has no SPMD partitioning rule, so under a multi-chip
``jit`` XLA replicates the kernel: every chip all-gathers the global batch
and computes all of it (verified on the 8-device CPU mesh — 17 all-gathers
and a fully-replicated output for a data-sharded input).  That silently
destroys data-parallel scaling on real pods.

Every fused kernel in this package is embarrassingly parallel over its
leading dimension(s), so this module wraps the kernel invocations with
``jax.experimental.custom_partitioning``:

* the first ``lead`` dims of every tensor operand/result keep whatever
  mesh axes the surrounding computation sharded them with (``lead=1`` for
  the row-flattened epilogue kernels; ``lead=2`` — batch AND head — for
  the attention kernels, so Megatron tensor parallelism over the head
  axis composes with data parallelism);
* every other dimension is declared need-replication;
* the per-shard lowering flattens the ``lead`` dims into one and
  re-invokes the kernel builder on local shapes (all grid/block
  parameters are derived from the shapes at call time, so the same
  builder serves global and per-shard calls).

Keeping operands UNflattened at the partitioning boundary is what makes
TP work: merging an unsharded batch dim with a model-sharded head dim
([B, H, s, d] -> [B*H, s, d] outside the boundary) has no GSPMD
representation, so XLA inserts head-dim all-gathers (20 of them at the
flagship geometry on a {data:2, model:2} mesh).  Inside the per-shard
lowering the shapes are local and dense, so the flatten is free.

The Shardy sharding rule and the GSPMD infer/partition callbacks are both
provided (jax defaults to Shardy; GSPMD remains selectable via
``jax_use_shardy_partitioner=False``).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import (custom_partitioning,
                                                  SdyShardingRule)
from jax.sharding import NamedSharding, PartitionSpec as P


def _build_rule(in_ranks: Sequence[int], out_ranks: Sequence[int],
                replicated: Tuple[int, ...],
                reduced_outputs: Tuple[int, ...],
                lead: int) -> SdyShardingRule:
    """Dims 0..lead-1 of every non-replicated operand / non-reduced result
    share one factor per dim; every other dimension gets a unique
    need-replication factor (reduced results are lead-dim reductions, so
    no dim carries the lead factors)."""
    fresh = iter(f"f{i}" for i in range(10000))
    lead_factors = tuple(f"b{i}" for i in range(lead))
    need_repl = []

    def mapping(rank: int, has_lead: bool):
        dims = []
        for axis in range(rank):
            if has_lead and axis < lead:
                dims.append(lead_factors[axis])
            else:
                f = next(fresh)
                need_repl.append(f)
                dims.append(f)
        return tuple(dims)

    operand_mappings = tuple(
        mapping(r, j not in replicated) for j, r in enumerate(in_ranks))
    result_mappings = tuple(
        mapping(r, j not in reduced_outputs)
        for j, r in enumerate(out_ranks))
    return SdyShardingRule(operand_mappings, result_mappings,
                           need_replication_factors=tuple(need_repl))


def _lead_specs(arg_infos, replicated, lead):
    """Per-dim mesh-axis assignment of dims 0..lead-1, merged across the
    sharded operands (first non-None entry per dim wins)."""
    specs = [None] * lead
    for j, info in enumerate(arg_infos):
        if j in replicated or info.ndim < lead:
            continue
        spec = info.sharding.spec
        for d in range(min(lead, len(spec))):
            if specs[d] is None and spec[d] is not None:
                specs[d] = spec[d]
    return tuple(specs)


def _axis_names(spec_entry):
    if spec_entry is None:
        return ()
    if isinstance(spec_entry, str):
        return (spec_entry,)
    return tuple(spec_entry)


def sharded_lead_call(fn: Callable, args, out_ranks: Sequence[int],
                      lead: int = 1,
                      replicated: Tuple[int, ...] = (0,),
                      reduced_outputs: Tuple[int, ...] = ()):
    """Invoke ``fn`` under a leading-dims sharding contract.

    The first ``lead`` dims of every non-replicated operand keep their
    mesh sharding; ``fn`` receives them FLATTENED into a single leading
    dim (identity for ``lead=1``) and must derive every static parameter
    (grid, block sizes) from the *local* argument shapes.  ``out_ranks``
    are the UNflattened result ranks; non-reduced results get the lead
    dims of the first tensor operand re-expanded.  ``replicated`` lists
    argument indices broadcast to all shards (the PRNG seed).  Results in
    ``reduced_outputs`` are reductions over the lead dims — each shard
    produces a partial sum which is psummed over the lead mesh axes and
    returned replicated.
    """
    replicated = tuple(replicated)
    reduced_outputs = tuple(reduced_outputs)
    in_ranks = tuple(a.ndim for a in args)
    multi = len(out_ranks) > 1
    first_t = next(j for j in range(len(args)) if j not in replicated)

    def _flatten(a):
        if lead == 1:
            return a
        return tuple(
            x if j in replicated else x.reshape((-1,) + x.shape[lead:])
            for j, x in enumerate(a))

    def _unflatten(outs, lead_shape):
        if lead == 1:
            return outs
        outs = list(outs) if multi else [outs]
        for j, o in enumerate(outs):
            if j not in reduced_outputs:
                outs[j] = o.reshape(lead_shape + o.shape[1:])
        return tuple(outs) if multi else outs[0]

    def wrapper(*a):
        return _unflatten(fn(*_flatten(a)), a[first_t].shape[:lead])

    def _norm(result_infos):
        # a single-output fn gets a bare ShapeDtypeStruct, not a sequence
        if isinstance(result_infos, (list, tuple)):
            return result_infos
        return [result_infos]

    def infer(mesh, arg_infos, result_infos):
        specs = _lead_specs(arg_infos, replicated, lead)
        shardings = tuple(
            NamedSharding(mesh, P(*([None] * r.ndim)))
            if j in reduced_outputs
            else NamedSharding(mesh, P(*specs, *([None] * (r.ndim - lead))))
            for j, r in enumerate(_norm(result_infos)))
        return shardings if multi else shardings[0]

    def partition(mesh, arg_infos, result_infos):
        specs = _lead_specs(arg_infos, replicated, lead)
        axes = sum((_axis_names(s) for s in specs), ())

        def lead_sh(ndim):
            return NamedSharding(
                mesh, P(*specs, *([None] * (ndim - lead))))

        def repl_sh(ndim):
            return NamedSharding(mesh, P(*([None] * ndim)))

        arg_sh = tuple(repl_sh(a.ndim) if j in replicated
                       else lead_sh(a.ndim)
                       for j, a in enumerate(arg_infos))
        out_sh = tuple(repl_sh(r.ndim) if j in reduced_outputs
                       else lead_sh(r.ndim)
                       for j, r in enumerate(_norm(result_infos)))
        if not multi:
            out_sh = out_sh[0]

        def lower(*local_args):
            outs = fn(*_flatten(local_args))
            if reduced_outputs and axes:
                outs = list(outs) if multi else [outs]
                for j in reduced_outputs:
                    outs[j] = jax.lax.psum(outs[j], axes)
                outs = tuple(outs) if multi else outs[0]
            return _unflatten(outs, local_args[first_t].shape[:lead])

        return mesh, lower, out_sh, arg_sh

    cp = custom_partitioning(wrapper)
    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=_build_rule(in_ranks, tuple(out_ranks), replicated,
                                  reduced_outputs, lead))
    return cp(*args)


def sharded_batch_call(fn: Callable, args, out_ranks: Sequence[int],
                       replicated: Tuple[int, ...] = (0,),
                       reduced_outputs: Tuple[int, ...] = ()):
    """Dim-0-only special case of :func:`sharded_lead_call` (the
    row-flattened epilogue kernels)."""
    return sharded_lead_call(fn, args, out_ranks, lead=1,
                             replicated=replicated,
                             reduced_outputs=reduced_outputs)
