"""Optimizer and LR schedule, bit-matched to the reference.

* BERT-style AdamW with the reference's exact update order — adam step first,
  then weight decay applied to the *already updated* parameter
  (``vilbert/optimization.py:107-189``: ``p.add_(-lr*wd, p)`` runs after
  ``p.addcdiv_``), eps=1e-6, correct_bias=True.
* Warmup-linear schedule with cooldown-stretched total:
  ``t_total = steps_per_epoch // accum * epochs``,
  ``warmup = warmup_proportion * t_total`` (kept as float, like the
  reference), ``adjusted_total = warmup + cooldown_factor*(t_total-warmup)``
  (``vilbert/vilbert_init.py:26-40``, ``vilbert/optimization.py:48-61``).
* No-decay groups: parameter names containing bias / LayerNorm
  (``vilbert_init.py:8-18``) — in our pytree that is every ``ln`` node,
  every linear ``b``, and ``cls.decoder_bias``.

Implemented as an optax-compatible GradientTransformation so it composes
with optax.MultiSteps/clipping if ever needed.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------- #
# schedules (multiplier functions; multiply by base lr)
# --------------------------------------------------------------------------- #
def constant_schedule(base_lr: float) -> Callable:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def warmup_linear_schedule(base_lr: float, warmup_steps: float,
                           t_total: float) -> Callable:
    """lambda(step) per reference WarmupLinearSchedule (optimization.py:48-61).

    step counts completed optimizer steps (torch LambdaLR applies
    lambda(k) to the k-th step, starting at k=0)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def warmup_constant_schedule(base_lr: float, warmup_steps: float) -> Callable:
    """Reference WarmupConstantSchedule (optimization.py:33-46): linear
    warmup 0->1 over warmup_steps, then constant 1."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        return base_lr * jnp.where(step < warmup_steps, warm, 1.0)

    return fn


def warmup_cosine_schedule(base_lr: float, warmup_steps: float,
                           t_total: float, cycles: float = 0.5) -> Callable:
    """Reference WarmupCosineSchedule (optimization.py:64-83): linear warmup
    then cosine decay 1->0 over the remaining steps (cycles=0.5 gives half a
    cosine period, i.e. monotone decay)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, t_total - warmup_steps)
        decay = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def warmup_cosine_hard_restarts_schedule(base_lr: float, warmup_steps: float,
                                         t_total: float,
                                         cycles: float = 1.0) -> Callable:
    """Reference WarmupCosineWithHardRestartsSchedule
    (optimization.py:86-103): after warmup, `cycles` cosine decays each
    restarting at 1; exactly 0 once progress >= 1."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, t_total - warmup_steps)
        phase = jnp.mod(cycles * progress, 1.0)
        decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * phase)))
        decay = jnp.where(progress >= 1.0, 0.0, decay)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


SCHEDULES = {
    "constant": lambda lr, warmup, total: constant_schedule(lr),
    "warmup_constant": lambda lr, warmup, total:
        warmup_constant_schedule(lr, warmup),
    "warmup_linear": warmup_linear_schedule,
    "warmup_cosine": warmup_cosine_schedule,
    "warmup_cosine_hard_restarts": warmup_cosine_hard_restarts_schedule,
}


def make_schedule(args, steps_per_epoch: int) -> Callable:
    """Reference get_optimization schedule selection (vilbert_init.py:23-40).

    ``steps_per_epoch`` counts OPTIMIZER steps (the engine's Loader yields
    one full accumulated batch per step, so len(train_loader) is already
    post-accumulation).  The reference divides its dataloader length by
    grad-accum because torch DataLoaders yield MICRObatches
    (dataset_init.py:205) — dividing here again would shrink t_total by
    accum x and silently park the LR at 0 for most of an accumulated run.
    """
    if args.no_scheduler or args.ConstantLR:
        return constant_schedule(args.learning_rate)
    t_total = steps_per_epoch * args.num_epochs
    warmup_steps = args.warmup_proportion * t_total
    adjusted = warmup_steps + args.cooldown_factor * (t_total - warmup_steps)
    name = getattr(args, "lr_schedule", "warmup_linear")
    return SCHEDULES[name](args.learning_rate, warmup_steps, adjusted)


# --------------------------------------------------------------------------- #
# AdamW (reference-exact)
# --------------------------------------------------------------------------- #
class AdamWRefState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def _is_no_decay(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if "decoder_bias" in keys:
        return True
    if "ln" in keys:
        return True
    return keys[-1] == "b"


def no_decay_mask(params):
    """True where weight decay must be skipped (bias/LayerNorm)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_no_decay(path), params)


class _AdamLeaf(tuple):
    """Marker tuple for adamw_ref's fused (mu, nu, p) leaf triples."""

    def __new__(cls, m, v, p):
        return super().__new__(cls, (m, v, p))


class FusedGradientTransformation(NamedTuple):
    """optax-compatible (init/update) plus ``apply``, a fused one-pass
    variant returning new params directly.

    The optax route costs four elementwise tree passes per step (mu, nu,
    update-delta, then p+u in the train step) that XLA does not fuse
    across the donated state buffers — measured ~17 ms for the 250M-param
    flagship, ~2x the HBM speed of light.  ``apply`` computes
    (new_mu, new_nu, new_p) in ONE tree_map so every leaf is a single
    read-modify-write fusion, and it is also the literal reference update
    order (torch mutates p in place; there is no delta in the reference)."""
    init: Callable
    update: Callable
    apply: Callable


def adamw_ref(schedule: Callable, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-6, weight_decay: float = 0.0,
              correct_bias: bool = True) -> FusedGradientTransformation:
    """Update rule (per parameter, reference optimization.py:130-188):

        m <- b1*m + (1-b1)*g ; v <- b2*v + (1-b2)*g^2
        step = lr * sqrt(1-b2^t)/(1-b1^t)          (if correct_bias)
        p <- p - step * m/(sqrt(v)+eps)
        p <- p - lr*wd*p                            (post-update decay)

    ``update`` returns the optax-style delta u = new_p - p;
    ``apply`` returns new_p itself (see FusedGradientTransformation).
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return AdamWRefState(count=jnp.zeros((), jnp.int32),
                             mu=jax.tree_util.tree_map(z, params),
                             nu=jax.tree_util.tree_map(z, params))

    def _scalars(state):
        # schedule is indexed by completed steps (LambdaLR semantics)
        lr = schedule(state.count)
        count = state.count + 1
        t = count.astype(jnp.float32)
        if correct_bias:
            step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        else:
            step_size = lr
        return lr, count, step_size

    def _leaf(m, v, g, p, nd, lr, step_size):
        new_m = b1 * m + (1.0 - b1) * g
        new_v = b2 * v + (1.0 - b2) * g * g
        new_p = p - step_size * new_m / (jnp.sqrt(new_v) + eps)
        if weight_decay > 0.0 and not nd:
            new_p = new_p - lr * weight_decay * new_p
        # _AdamLeaf (not a bare tuple) so the take() is_leaf predicate
        # cannot collide with tuple-typed structural nodes in the params
        # pytree (dict/list-only today, but cheap to make collision-proof)
        return _AdamLeaf(new_m, new_v, new_p)

    def apply(grads, state, params):
        lr, count, step_size = _scalars(state)
        decay_mask = no_decay_mask(params)
        out = jax.tree_util.tree_map(
            lambda m, v, g, p, nd: _leaf(m, v, g, p, nd, lr, step_size),
            state.mu, state.nu, grads, params, decay_mask)
        take = lambda i: jax.tree_util.tree_map(
            lambda o: o[i], out, is_leaf=lambda x: isinstance(x, _AdamLeaf))
        new_params = take(2)
        return new_params, AdamWRefState(count=count, mu=take(0),
                                         nu=take(1))

    def update(grads, state, params):
        assert params is not None, "adamw_ref needs params (decoupled decay)"
        new_params, new_state = apply(grads, state, params)
        updates = jax.tree_util.tree_map(jnp.subtract, new_params, params)
        return updates, new_state

    return FusedGradientTransformation(init, update, apply)


def make_optimizer(args, steps_per_epoch: int):
    schedule = make_schedule(args, steps_per_epoch)
    tx = adamw_ref(schedule, weight_decay=args.weight_decay)
    return tx, schedule
