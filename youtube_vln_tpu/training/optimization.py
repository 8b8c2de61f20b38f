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
    """Reference get_optimization schedule selection (vilbert_init.py:23-40)."""
    if (args.pretrain and args.no_scheduler) or args.ConstantLR:
        return constant_schedule(args.learning_rate)
    if args.no_scheduler:
        return constant_schedule(args.learning_rate)
    t_total = (steps_per_epoch // args.gradient_accumulation_steps) \
        * args.num_epochs
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


def adamw_ref(schedule: Callable, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-6, weight_decay: float = 0.0,
              correct_bias: bool = True) -> optax.GradientTransformation:
    """Update rule (per parameter, reference optimization.py:130-188):

        m <- b1*m + (1-b1)*g ; v <- b2*v + (1-b2)*g^2
        step = lr * sqrt(1-b2^t)/(1-b1^t)          (if correct_bias)
        p <- p - step * m/(sqrt(v)+eps)
        p <- p - lr*wd*p                            (post-update decay)

    Returned as an update: u = -step*m/(sqrt(v)+eps) - lr*wd*(p + that).
    """

    def init(params):
        z = lambda p: jnp.zeros_like(p)
        return AdamWRefState(count=jnp.zeros((), jnp.int32),
                             mu=jax.tree_util.tree_map(z, params),
                             nu=jax.tree_util.tree_map(z, params))

    def update(grads, state, params):
        assert params is not None, "adamw_ref needs params (decoupled decay)"
        # schedule is indexed by completed steps (LambdaLR semantics)
        lr = schedule(state.count)
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)
        if correct_bias:
            step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        else:
            step_size = lr

        decay_mask = no_decay_mask(params)

        def upd(m, v, p, nd):
            new_p = p - step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay > 0.0:
                wd = 0.0 if nd else weight_decay
                new_p = new_p - lr * wd * new_p
            return new_p - p

        updates = jax.tree_util.tree_map(upd, mu, nu, params, decay_mask)
        return updates, AdamWRefState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(args, steps_per_epoch: int):
    schedule = make_schedule(args, steps_per_epoch)
    tx = adamw_ref(schedule, weight_decay=args.weight_decay)
    return tx, schedule
