"""Step-time breakdown on the real chip: times jitted variants of the
train step to locate the bottleneck.

axon-safe timing: every dispatch gets a DIFFERENT input (axon memoizes
identical-input dispatches), dispatches are pipelined, and every result is
read back at the end (block_until_ready does not force execution).

  python scripts/profile_step.py full fwd encoder enc_grad heads ...
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_batch(cfg, bs, nc, s_t, s_v):
    from youtube_vln_tpu.ops.masking import max_masked_regions
    m_cap = max_masked_regions(s_v)
    rng = np.random.default_rng(0)
    tmask = (rng.random((bs, nc, s_v)) < 0.15).astype(np.int32)
    idx = np.full((bs, nc, m_cap), s_v, np.int32)
    rows = np.zeros((bs, nc, m_cap, cfg.v_target_size), np.float32)
    for i in range(bs):
        for j in range(nc):
            on = np.nonzero(tmask[i, j])[0][:m_cap]
            idx[i, j, :len(on)] = on
            r = rng.random((len(on), cfg.v_target_size)).astype(np.float32)
            rows[i, j, :len(on)] = r / r.sum(-1, keepdims=True)
    batch = {
        "instr_tokens": rng.integers(1, cfg.vocab_size, size=(bs, nc, s_t)),
        "instr_mask": np.ones((bs, nc, s_t), np.int32),
        "segment_ids": np.zeros((bs, nc, s_t), np.int32),
        "instr_targets": np.where(rng.random((bs, nc, s_t)) < 0.15,
                                  rng.integers(0, cfg.vocab_size,
                                               (bs, nc, s_t)), -1),
        "image_features": rng.normal(size=(bs, nc, s_v, 2048)).astype(np.float32),
        "image_locations": rng.random((bs, nc, s_v, 12)).astype(np.float32),
        "image_mask": np.ones((bs, nc, s_v), np.int32),
        "image_targets": rows,
        "image_targets_idx": idx,
        "image_targets_mask": tmask,
        "opt_mask": np.ones((bs, nc), bool),
        "ranking_target": np.zeros((bs,), np.int32),
    }
    batch["image_locations"][..., 11] = np.repeat(
        np.arange(s_v // 101), 101)[None, None, :]
    return batch


def time_fn(fn, n=8, warmup=2):
    """fn(i) -> pytree with at least one array output.  Dispatches n
    distinct calls, then reads every output back."""
    import jax
    for i in range(warmup):
        out = fn(1000 + i)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(i) for i in range(n)]
    for o in outs:
        float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    from youtube_vln_tpu.config import lily_base_config, RunConfig
    from youtube_vln_tpu.models import init_lily_params, lily_forward
    from youtube_vln_tpu.models.vilbert import bert_model
    from youtube_vln_tpu.parallel import train_step as ts

    variants = sys.argv[1:] or ["full", "fwd", "encoder"]

    cfg = lily_base_config(ranking=True, traj_judge=True, masked_vision=True,
                           masked_language=True, compute_dtype="bfloat16",
                           use_pallas_attention=True, remat=False)
    args = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                     masked_language=True, pretrain=True, learning_rate=2e-5,
                     num_epochs=1, gradient_accumulation_steps=1,
                     sparse_vision_targets=True)
    bs, nc, s_t, s_v = 8, 7, 60, 808
    batch = build_batch(cfg, bs, nc, s_t, s_v)
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    dbatch = jax.device_put(batch)
    dparams = jax.device_put(params)
    rng_key = jax.random.PRNGKey(0)
    flat = {k: np.ascontiguousarray(
        batch[k].reshape((-1,) + batch[k].shape[2:])) for k in
        ("instr_tokens", "instr_mask", "segment_ids", "image_features",
         "image_locations", "image_mask")}
    dflat = jax.device_put(flat)

    def jitter(b, key):
        # different input values every dispatch (axon memoizes repeats).
        # NOT an additive epsilon: adding 1e-12 to O(1)-magnitude f32
        # features is absorbed by rounding (ulp at 1.0 is ~1.2e-7), and a
        # scalar-uniform multiplicative epsilon quantizes to a handful of
        # factors at 1.0.  A random integer number of ulps guarantees a
        # representable, almost-surely-distinct factor per key while
        # perturbing features by <=12.5% (irrelevant for timing).
        b = dict(b)
        n_ulp = jax.random.randint(key, (), 1, 1 << 20)
        factor = 1.0 + n_ulp.astype(jnp.float32) * (2.0 ** -23)
        b["image_features"] = b["image_features"] * factor
        return b

    results = {}
    for name in variants:
        import dataclasses
        if name in ("full", "full_xla", "full_epi"):
            c = cfg
            if name == "full_xla":
                c = dataclasses.replace(cfg, use_pallas_attention=False)
            elif name == "full_epi":
                # the opt-in fused dropout+add+LN kernel (default OFF —
                # measured slower than XLA's fused uint8 path; this
                # variant exists to re-measure that)
                c = dataclasses.replace(cfg, use_pallas_epilogue=True)
            # donated chain: own param copy so later variants keep
            # dparams alive
            pcopy = jax.tree_util.tree_map(lambda x: x.copy(), dparams)
            state, tx, _ = ts.create_train_state(pcopy, args,
                                                 steps_per_epoch=1000)
            raw_step = ts.build_train_step(c, args, tx)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(st, b, key):
                st, m = raw_step(st, jitter(b, key), key)
                return st, m["loss/train"]

            holder = [state]

            def fn(i, holder=holder, step=step):
                st, loss = step(holder[0], dbatch,
                                jax.random.fold_in(rng_key, i))
                holder[0] = st
                return loss
            ms = time_fn(fn)
        elif name in ("full_nodrop", "full_rbg", "full_noattndrop",
                      "full_nohiddendrop"):
            if name == "full_nodrop":
                c = dataclasses.replace(
                    cfg, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0,
                    v_hidden_dropout_prob=0.0,
                    v_attention_probs_dropout_prob=0.0)
            elif name == "full_noattndrop":
                c = dataclasses.replace(
                    cfg, attention_probs_dropout_prob=0.0,
                    v_attention_probs_dropout_prob=0.0)
            elif name == "full_nohiddendrop":
                c = dataclasses.replace(
                    cfg, hidden_dropout_prob=0.0,
                    v_hidden_dropout_prob=0.0)
            else:
                c = cfg
            if name == "full_rbg":
                jax.config.update("jax_default_prng_impl", "rbg")
            # donated chain: own param copy so later variants keep
            # dparams alive
            pcopy = jax.tree_util.tree_map(lambda x: x.copy(), dparams)
            state, tx, _ = ts.create_train_state(pcopy, args,
                                                 steps_per_epoch=1000)
            raw_step = ts.build_train_step(c, args, tx)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(st, b, key):
                st, m = raw_step(st, jitter(b, key), key)
                return st, m["loss/train"]

            holder = [state]

            def fn(i, holder=holder, step=step):
                st, loss = step(holder[0], dbatch,
                                jax.random.fold_in(rng_key, i))
                holder[0] = st
                return loss
            ms = time_fn(fn)
            if name == "full_rbg":
                jax.config.update("jax_default_prng_impl", "threefry2x32")
        elif name == "noopt":
            tasks = ts._task_config(args, training=True)
            gf = jax.value_and_grad(ts.loss_fn, has_aux=True)

            @jax.jit
            def step(p, b, key):
                (_, m), g = gf(p, cfg, jitter(b, key), tasks, key, True)
                # consume every gradient leaf so nothing is pruned
                tot = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                          for x in jax.tree_util.tree_leaves(g))
                return m["loss/train"] + 0.0 * tot
            ms = time_fn(lambda i: step(dparams, dbatch,
                                        jax.random.fold_in(rng_key, i)))
        elif name == "fwd_train":
            tasks = ts._task_config(args, training=True)

            @jax.jit
            def step(p, b, key):
                return ts.loss_fn(p, cfg, jitter(b, key), tasks, key,
                                  True)[0]
            ms = time_fn(lambda i: step(dparams, dbatch,
                                        jax.random.fold_in(rng_key, i)))
        elif name in ("fwd", "fwd_dense"):
            b = dbatch
            if name == "fwd_dense":
                dense = dict(batch)
                dense.pop("image_targets_idx")
                dense["image_targets"] = np.full(
                    (bs, nc, s_v, cfg.v_target_size),
                    1.0 / cfg.v_target_size, np.float32)
                b = jax.device_put(dense)
            tasks = ts._task_config(args, training=True)

            @jax.jit
            def step(p, b, key):
                return ts.loss_fn(p, cfg, jitter(b, key), tasks, None,
                                  False)[0]
            ms = time_fn(lambda i: step(dparams, b,
                                        jax.random.fold_in(rng_key, i)))
        elif name in ("encoder", "encoder_xla"):
            c = cfg if name == "encoder" else dataclasses.replace(
                cfg, use_pallas_attention=False)

            @jax.jit
            def step(p, b, key):
                b = jitter(b, key)
                return bert_model(
                    p, c, b["instr_tokens"], b["image_features"],
                    b["image_locations"], token_type_ids=b["segment_ids"],
                    attention_mask=b["instr_mask"],
                    image_attention_mask=b["image_mask"])[2]
            ms = time_fn(lambda i: step(dparams, dflat,
                                        jax.random.fold_in(rng_key, i)))
        elif name == "enc_grad":
            def enc_loss(p, b, key):
                b = jitter(b, key)
                seq_t, seq_v, pt, pv = bert_model(
                    p, cfg, b["instr_tokens"], b["image_features"],
                    b["image_locations"], token_type_ids=b["segment_ids"],
                    attention_mask=b["instr_mask"],
                    image_attention_mask=b["image_mask"], train=True,
                    rng=key)
                return (jnp.sum(seq_t.astype(jnp.float32) ** 2)
                        + jnp.sum(seq_v.astype(jnp.float32) ** 2))

            @jax.jit
            def step(p, b, key):
                return jax.grad(enc_loss)(p, b, key)["t_pooler"]["w"].sum()
            ms = time_fn(lambda i: step(dparams, dflat,
                                        jax.random.fold_in(rng_key, i)))
        elif name == "heads":
            # forward + losses with the encoder output detached is awkward;
            # report fwd - encoder instead
            print("use: fwd - encoder")
            continue
        else:
            print(f"unknown variant {name}")
            continue
        results[name] = round(ms, 1)
        print(f"{name}: {results[name]} ms", flush=True)

    print(results)


if __name__ == "__main__":
    main()
