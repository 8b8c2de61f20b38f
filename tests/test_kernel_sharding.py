"""SPMD partitioning of the fused Pallas kernels (8-device CPU mesh).

Without the custom_partitioning rules in ops/partition.py, a pallas_call
under a multi-chip jit is fully replicated: XLA all-gathers the global
batch onto every chip and computes all of it (verified: 17 all-gathers and
a PartitionSpec() output for a data-sharded input).  These tests pin the
contract: batch-dim sharding flows through every kernel (fwd and VJP) with
ZERO all-gathers, values match the unfused reference, and the epilogue's
parameter grads come back replicated (psummed over the batch axes).

Scope caveat: every case here runs with dropout rate=0, because the Pallas
interpreter on the CPU mesh cannot lower the on-core PRNG.  The
cross-shard dropout property (shards must NOT replay each other's mask
streams — the motivation for global-row-id seeding) is therefore NOT
pinned by this file; it is validated by inspection plus the single-chip
linear-V probes in scripts/check_kernels_tpu.py, and that script's
multichip_dropout_check() runs the real-hardware check whenever >1 TPU
device is attached (pending pod access).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from youtube_vln_tpu.models.layers import attention_core, layer_norm
from youtube_vln_tpu.ops.attention import (pallas_attention_core,
                                           pallas_bi_attention)
from youtube_vln_tpu.ops.epilogue import pallas_dropout_add_ln


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(devs[:8].reshape(8), ("data",))


def _put(mesh, *arrays):
    sh = NamedSharding(mesh, P("data"))
    return [jax.device_put(x, sh) for x in arrays]


def test_attention_shards_without_gather(mesh, rng):
    b, h, s, d = 16, 2, 128, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.zeros((b, 1, 1, s), jnp.float32)
    qs, ks, vs, ms = _put(mesh, q, k, v, mask)

    f = jax.jit(pallas_attention_core)
    out = f(qs, ks, vs, ms)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_core(q, k, v, mask)),
                               atol=1e-5)
    assert "all-gather" not in f.lower(qs, ks, vs, ms).compile().as_text()

    def loss(q, k, v):
        return jnp.sum(pallas_attention_core(q, k, v, mask) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(attention_core(q, k, v, mask) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, c in zip("qkv", g, gr):
        assert a.sharding.spec == P("data"), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4,
                                   err_msg=name)


def test_bi_attention_shards_without_gather(mesh, rng):
    b, h, s_v, s_t, d = 16, 2, 64, 32, 64
    mk = lambda s: jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    q1, k1, v1 = mk(s_v), mk(s_v), mk(s_v)
    q2, k2, v2 = mk(s_t), mk(s_t), mk(s_t)
    v_mask = jnp.zeros((b, 1, 1, s_v), jnp.float32)
    t_mask = jnp.zeros((b, 1, 1, s_t), jnp.float32)
    args = _put(mesh, q1, k1, v1, q2, k2, v2, v_mask, t_mask)

    f = jax.jit(lambda *a: pallas_bi_attention(*a))
    c1, c2 = f(*args)
    assert c1.sharding.spec == P("data")
    assert c2.sharding.spec == P("data")
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(attention_core(q2, k1, v1, v_mask)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c2), np.asarray(attention_core(q1, k2, v2, t_mask)),
        atol=1e-5)
    assert "all-gather" not in f.lower(*args).compile().as_text()


def test_epilogue_shards_and_psums_param_grads(mesh, rng):
    n, d = 64, 256
    h = jnp.asarray(rng.normal(size=(n, 4, d)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(n, 4, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    hs, rs = _put(mesh, h, res)

    f = jax.jit(lambda h_, r_: pallas_dropout_add_ln(h_, r_,
                                                     {"w": w, "b": b}))
    out = f(hs, rs)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(layer_norm(h + res,
                                                     {"w": w, "b": b})),
                               atol=1e-5)
    assert "all-gather" not in f.lower(hs, rs).compile().as_text()

    def loss(h_, r_, w_, b_):
        return jnp.sum(jnp.sin(pallas_dropout_add_ln(h_, r_,
                                                     {"w": w_, "b": b_})))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(hs, rs, w, b)
    gr = jax.grad(
        lambda h_, r_, w_, b_: jnp.sum(jnp.sin(layer_norm(
            h_ + r_, {"w": w_, "b": b_}))), argnums=(0, 1, 2, 3))(h, res, w, b)
    specs = (P("data"), P("data"), P(), P())
    for name, a, c, spec in zip(("dh", "dres", "dw", "db"), g, gr, specs):
        assert a.sharding.spec == spec, name
        scale = max(float(jnp.max(jnp.abs(c))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=3e-6 * scale, err_msg=name)


def test_epilogue_odd_local_rows(mesh, rng):
    """Per-shard row counts that don't divide the row block (808 global /
    8 shards = 101 local) must pad inside the per-shard lowering instead
    of crashing — the original divisor search had no local fallback."""
    n, d = 808, 256
    h = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    hs, rs = _put(mesh, h, res)

    def loss(h_, r_, w_, b_):
        return jnp.sum(jnp.sin(pallas_dropout_add_ln(h_, r_,
                                                     {"w": w_, "b": b_})))

    out = jax.jit(lambda a, c: pallas_dropout_add_ln(
        a, c, {"w": w, "b": b}))(hs, rs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(layer_norm(h + res, {"w": w, "b": b})),
        atol=1e-5)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(hs, rs, w, b)
    gr = jax.grad(lambda a, c, w_, b_: jnp.sum(jnp.sin(layer_norm(
        a + c, {"w": w_, "b": b_}))), argnums=(0, 1, 2, 3))(h, res, w, b)
    for name, a, c in zip(("dh", "dres", "dw", "db"), g, gr):
        scale = max(float(jnp.max(jnp.abs(c))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=3e-6 * scale, err_msg=name)


def test_attention_head_dim_sharded(rng):
    """Megatron TP shards the HEAD dim (operands [B, H, s, d] with H on
    'model').  The lead=2 contract must keep dims (0, 1) sharded with zero
    gathers — pre-flattening [B, H] -> [B*H] outside the boundary has no
    GSPMD representation and forced 20 head-dim all-gathers at the
    flagship geometry (fwd AND the custom VJP)."""
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh2 = Mesh(devs[:8].reshape(4, 2), ("data", "model"))
    b, h, s, d = 8, 4, 128, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.zeros((b, 1, 1, s), jnp.float32)
    sh = NamedSharding(mesh2, P("data", "model"))
    qs, ks, vs = [jax.device_put(x, sh) for x in (q, k, v)]
    ms = jax.device_put(mask, NamedSharding(mesh2, P("data")))

    f = jax.jit(pallas_attention_core)
    out = f(qs, ks, vs, ms)
    assert out.sharding.spec == P("data", "model")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_core(q, k, v, mask)),
                               atol=1e-5)
    assert "all-gather" not in f.lower(qs, ks, vs, ms).compile().as_text()

    def loss(q, k, v):
        return jnp.sum(pallas_attention_core(q, k, v, mask) ** 2)

    gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    g = gf(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(attention_core(q, k, v, mask) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for name, a, c in zip("qkv", g, gr):
        assert a.sharding.spec == P("data", "model"), name
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4,
                                   err_msg=name)
    assert "all-gather" not in gf.lower(qs, ks, vs).compile().as_text()


def test_bi_attention_head_dim_sharded(rng):
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh2 = Mesh(devs[:8].reshape(4, 2), ("data", "model"))
    b, h, s_v, s_t, d = 8, 4, 64, 32, 64
    mk = lambda s: jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    q1, k1, v1 = mk(s_v), mk(s_v), mk(s_v)
    q2, k2, v2 = mk(s_t), mk(s_t), mk(s_t)
    v_mask = jnp.zeros((b, 1, 1, s_v), jnp.float32)
    t_mask = jnp.zeros((b, 1, 1, s_t), jnp.float32)
    sh = NamedSharding(mesh2, P("data", "model"))
    args = [jax.device_put(x, sh) for x in (q1, k1, v1, q2, k2, v2)]
    args += [jax.device_put(m, NamedSharding(mesh2, P("data")))
             for m in (v_mask, t_mask)]

    f = jax.jit(lambda *a: pallas_bi_attention(*a))
    c1, c2 = f(*args)
    assert c1.sharding.spec == P("data", "model")
    assert c2.sharding.spec == P("data", "model")
    np.testing.assert_allclose(
        np.asarray(c1), np.asarray(attention_core(q2, k1, v1, v_mask)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c2), np.asarray(attention_core(q1, k2, v2, t_mask)),
        atol=1e-5)
    assert "all-gather" not in f.lower(*args).compile().as_text()


def test_attention_dim0_sharded_over_two_axes(rng):
    """Under DP x TP the flattened (batch*heads) dim can be sharded over
    BOTH mesh axes; the partition rules must keep the tuple spec with zero
    gathers (covers _axis_names/_dim0_spec tuple handling)."""
    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh2 = Mesh(devs[:8].reshape(4, 2), ("data", "model"))
    b, h, s, d = 16, 2, 128, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.zeros((b, 1, 1, s), jnp.float32)
    sh = NamedSharding(mesh2, P(("data", "model")))
    qs, ks, vs, ms = [jax.device_put(x, sh) for x in (q, k, v, mask)]

    f = jax.jit(pallas_attention_core)
    out = f(qs, ks, vs, ms)
    assert out.sharding.spec == P(("data", "model"))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(attention_core(q, k, v, mask)),
                               atol=1e-5)
    assert "all-gather" not in f.lower(qs, ks, vs, ms).compile().as_text()
