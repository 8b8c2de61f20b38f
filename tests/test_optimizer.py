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
    warmup_constant_schedule,
    warmup_cosine_schedule,
    warmup_cosine_hard_restarts_schedule,
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


@pytest.mark.parametrize("name,make_ref,make_ours", [
    ("warmup_constant",
     lambda mod, opt: mod.WarmupConstantSchedule(opt, warmup_steps=4.2),
     lambda: warmup_constant_schedule(2e-5, 4.2)),
    ("warmup_cosine",
     lambda mod, opt: mod.WarmupCosineSchedule(opt, warmup_steps=4.2,
                                               t_total=20),
     lambda: warmup_cosine_schedule(2e-5, 4.2, 20)),
    ("warmup_cosine_cycles2",
     lambda mod, opt: mod.WarmupCosineSchedule(opt, warmup_steps=3,
                                               t_total=20, cycles=2.0),
     lambda: warmup_cosine_schedule(2e-5, 3, 20, cycles=2.0)),
    ("warmup_cosine_hard_restarts",
     lambda mod, opt: mod.WarmupCosineWithHardRestartsSchedule(
         opt, warmup_steps=4.2, t_total=20, cycles=3.0),
     lambda: warmup_cosine_hard_restarts_schedule(2e-5, 4.2, 20, cycles=3.0)),
])
def test_schedule_variants_match_lambdalr(ref_opt, name, make_ref, make_ours):
    """Cosine/constant variants (reference optimization.py:26-103)."""
    AdamW, _ = ref_opt
    import vilbert.optimization as mod
    p = torch.nn.Parameter(torch.zeros(3))
    opt = AdamW([p], lr=2e-5)
    sched = make_ref(mod, opt)
    ours = make_ours()
    for k in range(25):
        ref_lr = opt.param_groups[0]["lr"]
        # ours evaluates in f32 (in-graph); the torch LambdaLR oracle is
        # f64 — near cosine zeros the relative gap reaches ~1e-5
        assert float(ours(k)) == pytest.approx(ref_lr, rel=3e-5,
                                               abs=1e-12), (name, k)
        opt.step()
        sched.step()


def test_make_schedule_selects_variant():
    from youtube_vln_tpu.config import RunConfig
    from youtube_vln_tpu.training.optimization import make_schedule
    args = RunConfig(ranking=True, learning_rate=1e-4, num_epochs=10,
                     lr_schedule="warmup_cosine")
    sched = make_schedule(args, steps_per_epoch=10)
    # t_total=100, warmup=20, adjusted=20+2*80=180: cosine after warmup
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(0.5e-4, rel=1e-6)
    assert float(sched(20)) == pytest.approx(1e-4, rel=1e-6)
    assert 0.0 < float(sched(100)) < 1e-4


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


def test_fused_apply_equals_delta_update(rng):
    """adamw_ref.apply (one-pass, returns new params) is the same update as
    the optax-style update+add route, leaf for leaf."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from youtube_vln_tpu.config import tiny_config
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.training.optimization import (adamw_ref,
                                                       warmup_linear_schedule)

    cfg = tiny_config()
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    tx = adamw_ref(warmup_linear_schedule(1e-3, 10, 100), weight_decay=0.01)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), params)

    state = tx.init(params)
    for _ in range(3):
        new_params, new_state = tx.apply(grads, state, params)
        updates, state_u = tx.update(grads, state, params)
        via_delta = jax.tree_util.tree_map(jnp.add, params, updates)
        for a, b in zip(jax.tree_util.tree_leaves(new_params),
                        jax.tree_util.tree_leaves(via_delta)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(new_state),
                        jax.tree_util.tree_leaves(state_u)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        params, state = new_params, new_state


def test_schedule_with_accumulation_matches_reference_totals():
    """Regression: steps_per_epoch passed to make_schedule counts OPTIMIZER
    steps (the engine loader yields accumulated batches), so t_total must
    NOT be divided by grad-accum again — the double division parked the LR
    at 0 after ~1/accum of an accumulated run."""
    import numpy as np
    from youtube_vln_tpu.config import RunConfig
    from youtube_vln_tpu.training.optimization import make_schedule

    micro_per_epoch, accum, epochs = 40, 4, 3
    opt_steps_per_epoch = micro_per_epoch // accum   # == len(train_loader)
    args = RunConfig(pretrain=True, learning_rate=1.0, num_epochs=epochs,
                     gradient_accumulation_steps=accum,
                     warmup_proportion=0.2, cooldown_factor=2.0)
    sched = make_schedule(args, opt_steps_per_epoch)

    # reference totals (vilbert_init.py:26-40 with a MICRObatch loader):
    # t_total = len(loader)//accum * epochs
    t_total = (micro_per_epoch // accum) * epochs
    warmup = 0.2 * t_total
    adjusted = warmup + 2.0 * (t_total - warmup)
    for step in (0, 3, int(warmup), 20, int(adjusted) - 1):
        warm = step / max(1.0, warmup)
        decay = max(0.0, (adjusted - step) / max(1.0, adjusted - warmup))
        expect = warm if step < warmup else decay
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6,
                                   err_msg=f"step {step}")
    # the double-division bug reached lr=0 around adjusted/accum
    assert float(sched(int(adjusted / accum) + 1)) > 0.0
