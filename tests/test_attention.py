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


def test_dispatch_heuristic():
    assert use_pallas_for(808, 808, 128)       # vision self-attention
    assert use_pallas_for(60, 808, 128)        # text->vision cross
    assert use_pallas_for(808, 60, 128)        # vision->text cross
    assert not use_pallas_for(60, 60, 64)      # tiny text self-attention
    assert not use_pallas_for(808, 808, 96)    # unsupported head dim
