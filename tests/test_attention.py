"""Fused-attention kernel tests (Pallas interpret mode on the CPU mesh).

On-TPU validation (compiled kernels, dropout PRNG determinism, 1e-7 parity
at [3,8,808,128]) is exercised by the verify drive; here the interpreter
checks the same math path shape-by-shape.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtube_vln_tpu.models.layers import attention_core
from youtube_vln_tpu.ops.attention import (pallas_attention_core,
                                           pallas_bi_attention,
                                           use_pallas_for)


@pytest.mark.parametrize("b,h,sq,skv,d", [
    (2, 4, 64, 64, 64),
    (1, 2, 128, 64, 128),   # cross-attention shape (text->vision etc.)
    (1, 2, 128, 60, 128),   # non-aligned kv length (vision->text)
])
def test_fused_matches_reference(rng, b, h, sq, skv, d):
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, skv, d)), jnp.float32)
    maskrow = (rng.random((b, skv)) < 0.9).astype(np.float32)
    mask = jnp.asarray(((1 - maskrow) * -10000.0)[:, None, None, :])

    ref = attention_core(q, k, v, mask)
    out = pallas_attention_core(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_gradients(rng):
    b, h, s, d = 1, 2, 64, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    mask = jnp.zeros((b, 1, 1, s), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(attention_core(q, k, v, mask) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(pallas_attention_core(q, k, v, mask) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   err_msg=name)


def test_mask_fully_blocks_keys(rng):
    b, h, s, d = 1, 2, 64, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    maskrow = np.ones((b, s), np.float32)
    maskrow[:, s // 2:] = 0
    mask = jnp.asarray(((1 - maskrow) * -10000.0)[:, None, None, :])
    out = pallas_attention_core(q, k, v, mask)
    # perturbing masked-out values must not change the output
    v2 = v.at[:, :, s // 2:, :].add(100.0)
    out2 = pallas_attention_core(q, k, v2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def _bi_inputs(rng, b=1, h=2, s_v=128, s_t=60, d=64):
    mk = lambda s: jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    q1, k1, v1 = mk(s_v), mk(s_v), mk(s_v)
    q2, k2, v2 = mk(s_t), mk(s_t), mk(s_t)
    vrow = (rng.random((b, s_v)) < 0.9).astype(np.float32)
    trow = (rng.random((b, s_t)) < 0.9).astype(np.float32)
    v_mask = jnp.asarray(((1 - vrow) * -10000.0)[:, None, None, :])
    t_mask = jnp.asarray(((1 - trow) * -10000.0)[:, None, None, :])
    return (q1, k1, v1, q2, k2, v2, v_mask, t_mask)


def test_bi_attention_matches_two_calls(rng):
    """The single-launch fused kernel equals the two-call formulation
    (models/vilbert.py:bi_attention unfused path)."""
    q1, k1, v1, q2, k2, v2, v_mask, t_mask = _bi_inputs(rng)
    ref1 = attention_core(q2, k1, v1, v_mask)
    ref2 = attention_core(q1, k2, v2, t_mask)
    ctx1, ctx2 = pallas_bi_attention(q1, k1, v1, q2, k2, v2, v_mask, t_mask)
    np.testing.assert_allclose(np.asarray(ctx1), np.asarray(ref1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx2), np.asarray(ref2), atol=1e-5)


def test_bi_attention_gradients(rng):
    q1, k1, v1, q2, k2, v2, v_mask, t_mask = _bi_inputs(rng, s_v=64, s_t=64)
    args = (q1, k1, v1, q2, k2, v2)

    def loss_ref(*a):
        c1 = attention_core(a[3], a[1], a[2], v_mask)
        c2 = attention_core(a[0], a[4], a[5], t_mask)
        return jnp.sum(c1 ** 2) + jnp.sum(jnp.sin(c2))

    def loss_pal(*a):
        c1, c2 = pallas_bi_attention(*a, v_mask, t_mask)
        return jnp.sum(c1 ** 2) + jnp.sum(jnp.sin(c2))

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gp = jax.grad(loss_pal, argnums=tuple(range(6)))(*args)
    for name, a, b_ in zip(("q1", "k1", "v1", "q2", "k2", "v2"), gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4,
                                   err_msg=name)


def test_bi_attention_in_model_path(rng):
    """bert_model with bi_attention_fn set equals the default two-call path
    (eval mode, f32)."""
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.models.vilbert import bert_model

    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    n, s_t, s_v = 2, 16, 24
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (n, s_t)))
    feats = jnp.asarray(rng.normal(size=(n, s_v, cfg.v_feature_size)),
                        jnp.float32)
    locs = jnp.asarray(rng.random((n, s_v, 12)), jnp.float32)

    ref = bert_model(params, cfg, tokens, feats, locs)
    out = bert_model(params, cfg, tokens, feats, locs,
                     bi_attention_fn=pallas_bi_attention)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dispatch_heuristic():
    assert use_pallas_for(808, 808, 128)       # vision self-attention
    assert use_pallas_for(60, 808, 128)        # text->vision cross
    assert use_pallas_for(808, 60, 128)        # vision->text cross
    assert not use_pallas_for(60, 60, 64)      # tiny text self-attention
    assert not use_pallas_for(808, 808, 96)    # unsupported head dim
