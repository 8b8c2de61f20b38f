"""Device mesh and sharding plans.

The reference's only parallelism is DDP data-parallel over NCCL
(``utils/distributed.py:97-104``); here parallelism is declarative: one
jitted train step over a ``jax.sharding.Mesh``, batch sharded on the
``data`` axis, gradients all-reduced by XLA over ICI.  A ``model`` axis is
part of the design so tensor parallelism is a mesh-shape change, not a code
change: Megatron-style column/row rules are applied to the FFN and attention
projections via NamedSharding annotations and GSPMD inserts the collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axes: Tuple[str, ...] = ("data", "model"),
              devices=None) -> Mesh:
    """Create a mesh; default = all devices on the data axis, model=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not shape:
        shape = (n, 1) if len(axes) == 2 else (n,)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes[: len(shape)])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path, leaf, cfg) -> P:
    """Megatron-style TP rules when a 'model' axis exists.

    column-parallel: attention q/k/v kernels, FFN 'inter' kernel, the
    bi-attention projections (out features sharded);
    row-parallel: attention 'out' and FFN 'out' kernels (in features
    sharded).  Biases of column-parallel layers shard on their only dim;
    row-parallel ('out') biases stay replicated (they add after the
    psum).  The word embedding shards on the vocab dim; all other
    embeddings/LN/head leaves are replicated.  param_shardings falls
    back to replication for any dim the model axis does not divide.
    """
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    col_parallel = ("query", "key", "value", "inter", "query1", "key1",
                    "value1", "query2", "key2", "value2")
    if leaf.ndim == 2 and keys[-1] == "w":
        if keys[-2] in col_parallel:
            return P(None, "model")          # column parallel
        if keys[-2] == "out":
            return P("model", None)          # row parallel
    if leaf.ndim == 2 and keys[-1] == "word":
        return P("model", None)              # vocab-sharded embedding
    if leaf.ndim == 1 and keys[-1] == "b" and keys[-2] in col_parallel:
        # the bias of a column-parallel layer adds onto the
        # feature-sharded activation — shard it the same way (a
        # row-parallel 'out' bias adds AFTER the psum -> replicated)
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params, cfg=None):
    """NamedSharding tree for params.

    With model axis size 1 (pure DP) everything is effectively replicated;
    the specs still carry the TP plan so changing the mesh shape activates
    it."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    def to_sharding(path, leaf):
        spec = _param_spec(path, leaf, cfg)
        # only shard dims that divide evenly; else replicate
        m = mesh.shape["model"]
        for axis, name in enumerate(spec):
            if name == "model" and leaf.shape[axis] % m != 0:
                return replicated(mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, shardings):
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
