"""Bit-match the optimizer/schedule against the reference implementation.

The oracle is the actual reference AdamW + WarmupLinearSchedule imported
from /root/reference and run on torch tensors.
"""
import numpy as np
import pytest
import torch

from conftest import import_reference_vilbert  # ensures sys.path + stubs

import jax
import jax.numpy as jnp

from youtube_vln_tpu.training.optimization import (
    adamw_ref,
    warmup_linear_schedule,
    no_decay_mask,
)


@pytest.fixture(scope="module")
def ref_opt():
    import_reference_vilbert()
    from vilbert.optimization import AdamW, WarmupLinearSchedule
    return AdamW, WarmupLinearSchedule


def test_schedule_matches_lambdalr(ref_opt):
    AdamW, WarmupLinearSchedule = ref_opt
    p = torch.nn.Parameter(torch.zeros(3))
    opt = AdamW([p], lr=2e-5)
    sched = WarmupLinearSchedule(opt, warmup_steps=4.2, t_total=20)
    ours = warmup_linear_schedule(2e-5, 4.2, 20)
    for k in range(25):
        ref_lr = opt.param_groups[0]["lr"]
        assert float(ours(k)) == pytest.approx(ref_lr, rel=1e-6), k
        opt.step()
        sched.step()


def test_adamw_matches_reference(ref_opt, rng):
    AdamW, WarmupLinearSchedule = ref_opt

    w0 = rng.normal(size=(4, 5)).astype(np.float32)
    b0 = rng.normal(size=(5,)).astype(np.float32)
    grads_seq = [
        {"w": rng.normal(size=(4, 5)).astype(np.float32),
         "b": rng.normal(size=(5,)).astype(np.float32)}
        for _ in range(7)
    ]

    # ----- reference: decay group for w, no-decay for b -----
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = AdamW([
        {"params": [tb], "weight_decay": 0.0},
        {"params": [tw], "weight_decay": 1e-2},
    ], lr=3e-4)
    sched = WarmupLinearSchedule(opt, warmup_steps=2, t_total=10)
    for g in grads_seq:
        tw.grad = torch.from_numpy(g["w"].copy())
        tb.grad = torch.from_numpy(g["b"].copy())
        opt.step()
        sched.step()

    # ----- ours -----
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    mask = no_decay_mask(params)
    assert mask == {"w": False, "b": True}
    tx = adamw_ref(warmup_linear_schedule(3e-4, 2, 10), weight_decay=1e-2)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(
            {"w": jnp.asarray(g["w"]), "b": jnp.asarray(g["b"])},
            state, params)
        params = jax.tree_util.tree_map(jnp.add, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_no_decay_mask_structure():
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    mask = no_decay_mask(params)
    assert mask["text_embed"]["word"] is False          # embeddings decay
    assert mask["text_embed"]["ln"]["w"] is True        # LayerNorm no-decay
    assert mask["text_layers"][0]["attn"]["query"]["b"] is True
    assert mask["text_layers"][0]["attn"]["query"]["w"] is False
    assert mask["cls"]["decoder_bias"] is True


def test_orbax_round_trip(tmp_path):
    import jax
    import numpy as np
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.training import checkpoint as ckpt

    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    path = ckpt.save_orbax(tmp_path / "ck", params, step=7, epoch=2)
    template = {"params": jax.tree_util.tree_map(np.zeros_like, params),
                "step": 0, "epoch": 0}
    restored = ckpt.load_orbax(path, template)
    assert restored["step"] == 7 and restored["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
