"""Fused dropout+add+LayerNorm epilogue tests (Pallas interpret mode).

The dropout path uses the on-core TPU PRNG, which the CPU interpreter
cannot lower (same restriction as the attention kernels' dropout) — mask
determinism and drop-fraction are validated on the real chip by the verify
drive and bench.py's parity assertions.  Here the interpreter checks the
LayerNorm math, the custom VJP, the shape fallbacks, and the model wiring.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtube_vln_tpu.models.layers import dropout_add_ln, layer_norm
from youtube_vln_tpu.ops.epilogue import (pallas_dropout_add_ln,
                                          select_epilogue_fn, _row_block)


def _inputs(rng, shape=(4, 104, 256), dtype=jnp.float32):
    h = jnp.asarray(rng.normal(size=shape), dtype)
    res = jnp.asarray(rng.normal(size=shape), dtype)
    d = shape[-1]
    p = {"w": jnp.asarray(rng.normal(size=(d,)), jnp.float32),
         "b": jnp.asarray(rng.normal(size=(d,)), jnp.float32)}
    return h, res, p


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_unfused(rng, dtype):
    h, res, p = _inputs(rng, dtype=dtype)
    out = pallas_dropout_add_ln(h, res, p)
    ref = layer_norm(h + res, p)
    assert out.dtype == ref.dtype
    # bf16: reduction-order noise in the f32 LN stats can flip the final
    # bf16 rounding, so allow a couple of ulps (1 ulp ~ 0.8% relative)
    tol = dict(atol=1e-5) if dtype == jnp.float32 else dict(atol=5e-2,
                                                            rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), **tol)


def test_fused_gradients(rng):
    h, res, p = _inputs(rng)

    def loss_pal(h, res, w, b):
        return jnp.sum(jnp.sin(pallas_dropout_add_ln(h, res,
                                                     {"w": w, "b": b})))

    def loss_ref(h, res, w, b):
        return jnp.sum(jnp.sin(layer_norm(h + res, {"w": w, "b": b})))

    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(h, res, p["w"], p["b"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, res, p["w"], p["b"])
    for name, a, b in zip(("dh", "dres", "dw", "db"), gp, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * scale, err_msg=name)


def test_row_block_is_sublane_aligned():
    for n in (45248, 5656, 2828, 101, 7, 512):
        rb = _row_block(n)
        assert rb % 8 == 0 and rb >= 8


def test_shape_fallback_returns_none(rng):
    # feature dim not a multiple of 128 -> caller must fall back
    h, res, p = _inputs(rng, shape=(4, 8, 96))
    assert pallas_dropout_add_ln(h, res, p) is None


def test_odd_row_counts_pad_correctly(rng):
    """Row counts that don't divide the block (e.g. per-shard slices under
    SPMD) are padded inside the kernel: outputs and ALL gradients must
    still match the unfused path (padded do-rows are zero, so dw/db are
    unaffected)."""
    h, res, p = _inputs(rng, shape=(1, 101, 256))

    out = pallas_dropout_add_ln(h, res, p)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(layer_norm(h + res, p)), atol=1e-5)

    def loss_pal(h, res, w, b):
        return jnp.sum(jnp.sin(pallas_dropout_add_ln(h, res,
                                                     {"w": w, "b": b})))

    def loss_ref(h, res, w, b):
        return jnp.sum(jnp.sin(layer_norm(h + res, {"w": w, "b": b})))

    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(h, res, p["w"], p["b"])
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, res, p["w"], p["b"])
    for name, a, b in zip(("dh", "dres", "dw", "db"), gp, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6 * scale, err_msg=name)


def test_select_epilogue_fn_gating():
    from youtube_vln_tpu.config import tiny_config
    cfg = tiny_config(use_pallas_attention=True, use_pallas_epilogue=True)
    assert select_epilogue_fn(cfg, platform="cpu") is None
    assert select_epilogue_fn(cfg, platform="tpu") is not None
    # measured slower than the XLA epilogue at the flagship geometry, so
    # the kernel is opt-in (config.py:use_pallas_epilogue)
    cfg2 = tiny_config(use_pallas_attention=True)
    assert select_epilogue_fn(cfg2, platform="tpu") is None
    cfg3 = tiny_config(use_pallas_attention=False,
                       use_pallas_epilogue=True)
    assert select_epilogue_fn(cfg3, platform="tpu") is None


def test_selected_fn_eval_path_is_exact(rng):
    """At eval (train=False) the selected fn must route to the unfused XLA
    path — bit-identical to layer_norm(h + res)."""
    from youtube_vln_tpu.config import tiny_config
    cfg = tiny_config(use_pallas_attention=True, use_pallas_epilogue=True)
    fn = select_epilogue_fn(cfg, platform="tpu")
    h, res, p = _inputs(rng)
    out = fn(h, res, p, 0.1, jax.random.PRNGKey(0), False)
    assert bool(jnp.all(out == layer_norm(h + res, p)))


def test_model_path_with_fused_epilogue(rng):
    """bert_model with an explicit kernel-backed epilogue_fn equals the
    default path (dropout rates zeroed so the interpreter can run it)."""
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.models.vilbert import bert_model

    cfg = tiny_config(hidden_size=128, v_hidden_size=128, bi_hidden_size=128,
                      intermediate_size=128, v_intermediate_size=128,
                      hidden_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      v_attention_probs_dropout_prob=0.0)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    n, s_t, s_v = 2, 16, 24
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (n, s_t)))
    feats = jnp.asarray(rng.normal(size=(n, s_v, cfg.v_feature_size)),
                        jnp.float32)
    locs = jnp.asarray(rng.random((n, s_v, 12)), jnp.float32)

    def epilogue_fn(h, res, ln_p, rate, rng_, train):
        out = pallas_dropout_add_ln(h, res, ln_p, rate=rate, rng=rng_,
                                    train=train)
        assert out is not None, "kernel path must engage at this geometry"
        return out

    ref = bert_model(params, cfg, tokens, feats, locs,
                     rng=jax.random.PRNGKey(1), train=True)
    out = bert_model(params, cfg, tokens, feats, locs,
                     rng=jax.random.PRNGKey(1), train=True,
                     epilogue_fn=epilogue_fn)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dropout_rate_edge_cases(rng):
    """uint8-quantized dropout: unbiased in expectation at the usual rates
    and exactly zero at rate=1.0 (the reference's p=1 behavior)."""
    from youtube_vln_tpu.models.layers import dropout

    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    key = jax.random.PRNGKey(0)
    assert bool(jnp.all(dropout(x, 1.0, key, True) == 0.0))
    assert bool(jnp.all(dropout(x, 0.0, key, True) == x))
    assert bool(jnp.all(dropout(x, 0.5, key, False) == x))  # eval: identity
    y = dropout(x, 0.1, key, True)
    kept = np.asarray(y != 0)
    assert abs(kept.mean() - 230 / 256) < 0.02  # effective keep = 230/256
    # unbiased: kept values are scaled by exactly 256/230
    np.testing.assert_allclose(np.asarray(y)[kept],
                               np.asarray(x * (256.0 / 230))[kept], rtol=1e-6)
