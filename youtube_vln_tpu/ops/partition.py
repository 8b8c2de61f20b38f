"""GSPMD partitioning for the fused Pallas kernels.

``pl.pallas_call`` has no SPMD partitioning rule, so under a multi-chip
``jit`` XLA replicates the kernel: every chip all-gathers the global batch
and computes all of it (verified on the 8-device CPU mesh — 17 all-gathers
and a fully-replicated output for a data-sharded input).  That silently
destroys data-parallel scaling on real pods.

Every fused kernel in this package is embarrassingly parallel over its
leading (batch*head or flattened-row) dimension, so this module wraps the
kernel invocations with ``jax.experimental.custom_partitioning``: dim 0 of
every tensor operand/result keeps whatever mesh axes the surrounding
computation sharded it with, every other dimension is declared
need-replication, and the per-shard lowering simply re-invokes the kernel
builder on local shapes (all grid/block parameters are derived from the
shapes at call time, so the same builder serves global and per-shard
calls).

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
                reduced_outputs: Tuple[int, ...]) -> SdyShardingRule:
    """dim 0 of every non-replicated operand / non-reduced result shares one
    batch factor; every other dimension gets a unique need-replication
    factor (reduced results are batch-reductions, so no dim carries the
    batch factor)."""
    fresh = iter(f"f{i}" for i in range(10000))
    need_repl = []

    def mapping(rank: int, batch_dim0: bool):
        dims = []
        for axis in range(rank):
            if axis == 0 and batch_dim0:
                dims.append("b")
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


def _dim0_spec(arg_infos, replicated):
    """The mesh-axis assignment of dim 0, from the first sharded operand."""
    for j, info in enumerate(arg_infos):
        if j in replicated or info.ndim == 0:
            continue
        spec = info.sharding.spec
        if len(spec) > 0 and spec[0] is not None:
            return spec[0]
    return None


def _axis_names(spec_entry):
    if spec_entry is None:
        return ()
    if isinstance(spec_entry, str):
        return (spec_entry,)
    return tuple(spec_entry)


def sharded_batch_call(fn: Callable, args, out_ranks: Sequence[int],
                       replicated: Tuple[int, ...] = (0,),
                       reduced_outputs: Tuple[int, ...] = ()):
    """Invoke ``fn(*args)`` under a dim-0 batch-sharding contract.

    fn must take tensor-only positional args and derive every static
    parameter (grid, block sizes) from the *local* argument shapes.
    ``replicated`` lists argument indices that are broadcast to all shards
    (the PRNG seed).  Results are sharded on dim 0 like the inputs, except
    the indices in ``reduced_outputs``: those are batch-dim reductions —
    each shard produces a partial sum which is psummed over the batch mesh
    axes and returned replicated.
    """
    replicated = tuple(replicated)
    reduced_outputs = tuple(reduced_outputs)
    in_ranks = tuple(a.ndim for a in args)
    multi = len(out_ranks) > 1

    def _norm(result_infos):
        # a single-output fn gets a bare ShapeDtypeStruct, not a sequence
        if isinstance(result_infos, (list, tuple)):
            return result_infos
        return [result_infos]

    def infer(mesh, arg_infos, result_infos):
        b = _dim0_spec(arg_infos, replicated)
        shardings = tuple(
            NamedSharding(mesh, P(*([None] * r.ndim)))
            if j in reduced_outputs
            else NamedSharding(mesh, P(b, *([None] * (r.ndim - 1))))
            for j, r in enumerate(_norm(result_infos)))
        return shardings if multi else shardings[0]

    def partition(mesh, arg_infos, result_infos):
        b = _dim0_spec(arg_infos, replicated)
        axes = _axis_names(b)

        def batch_sh(ndim):
            return NamedSharding(mesh, P(b, *([None] * (ndim - 1))))

        def repl_sh(ndim):
            return NamedSharding(mesh, P(*([None] * ndim)))

        arg_sh = tuple(repl_sh(a.ndim) if j in replicated
                       else batch_sh(a.ndim)
                       for j, a in enumerate(arg_infos))
        out_sh = tuple(repl_sh(r.ndim) if j in reduced_outputs
                       else batch_sh(r.ndim)
                       for j, r in enumerate(_norm(result_infos)))
        if not multi:
            out_sh = out_sh[0]

        def lower(*local_args):
            outs = fn(*local_args)
            if reduced_outputs and axes:
                outs = list(outs) if multi else [outs]
                for j in reduced_outputs:
                    outs[j] = jax.lax.psum(outs[j], axes)
                outs = tuple(outs) if multi else outs[0]
            return outs

        return mesh, lower, out_sh, arg_sh

    cp = custom_partitioning(fn)
    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=_build_rule(in_ranks, tuple(out_ranks), replicated,
                                  reduced_outputs))
    return cp(*args)
