"""Two-process jax.distributed CPU test.

Exercises the real multi-host paths that single-process suites cannot:
``parallel/distributed.py:initialize`` (coordinator rendezvous), the
engine's per-process loader sharding composition
(``Loader(num_shards=jax.process_count(), shard=jax.process_index())``,
training/engine.py), and ONE full train step over the cross-process
global mesh (replicated state, data-sharded global batch, in-graph grad
all-reduce spanning both controllers).  Two subprocesses, 2 fake CPU
devices each -> a 4-device global mesh; asserts disjoint-covering shards,
identical in-graph global reductions, and identical loss + updated
parameters on every process.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import json, os, sys
    repo, addr, pid, outdir = sys.argv[1:5]
    sys.path.insert(0, repo)

    import jax
    # the axon site-hook pins JAX_PLATFORMS=axon; only the config update
    # sticks (see tests/conftest.py) — and it must land before backend init
    jax.config.update("jax_platforms", "cpu")

    from youtube_vln_tpu.parallel import distributed as D
    # must run BEFORE anything touches the jax backend
    D.initialize(coordinator_address=addr, num_processes=2,
                 process_id=int(pid))

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    # engine-style loader sharding (training/engine.py Loader wiring)
    from youtube_vln_tpu.data.loader import Loader, shard_indices

    class TinyDataset:
        def __len__(self):
            return 21

        def num_candidates(self):
            return 2

        def __getitem__(self, i):
            return {
                "opt_mask": np.ones(1, bool),
                "instr_tokens": np.full((1, 4), i, np.int32),
                "ranking_target": np.asarray(0, np.int32),
            }

    loader = Loader(TinyDataset(), batch_size=2, shuffle=True, seed=7,
                    num_shards=jax.process_count(),
                    shard=jax.process_index())
    seen = []
    for batch in loader:
        seen += [int(v) for v in batch["instr_tokens"][:, 0, 0]]

    # in-graph global reduction over the 2-process 4-device mesh: every
    # process must observe the same global sum (the GSPMD replacement for
    # the reference's eager dist.all_reduce)
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    local = (np.arange(8, dtype=np.float32).reshape(4, 2)
             + 100.0 * int(pid))
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(garr)
    total = float(total)   # fully-replicated: readable on every process

    shard = shard_indices(21, shuffle=True, seed=7, epoch=0,
                          num_shards=jax.process_count(),
                          shard=jax.process_index())

    # ---- one REAL train step over the cross-process global mesh -------
    # (multi-controller composition the single-process suites can't reach:
    # replicated state + data-sharded global batch + in-graph grad
    # all-reduce spanning both processes)
    from youtube_vln_tpu.config import tiny_config, RunConfig
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.parallel import train_step as ts

    cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                      masked_language=True)
    run_args = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                         masked_language=True, pretrain=True,
                         learning_rate=1e-4, num_epochs=1)
    gb, lb, nc, s_t, s_v = 4, 2, 7, 8, 10   # global/local batch
    rng0 = np.random.default_rng(0)          # same stream on BOTH procs
    gbatch = {
        "instr_tokens": rng0.integers(1, cfg.vocab_size,
                                      (gb, nc, s_t)).astype(np.int32),
        "instr_mask": np.ones((gb, nc, s_t), np.int32),
        "segment_ids": np.zeros((gb, nc, s_t), np.int32),
        "instr_targets": np.where(
            rng0.random((gb, nc, s_t)) < 0.3,
            rng0.integers(0, cfg.vocab_size, (gb, nc, s_t)), -1
        ).astype(np.int32),
        "image_features": rng0.normal(
            size=(gb, nc, s_v, cfg.v_feature_size)).astype(np.float32),
        "image_locations": rng0.random((gb, nc, s_v, 12)).astype(np.float32),
        "image_mask": np.ones((gb, nc, s_v), np.int32),
        "image_targets": np.full((gb, nc, s_v, cfg.v_target_size),
                                 1.0 / cfg.v_target_size, np.float32),
        "image_targets_mask": (rng0.random((gb, nc, s_v)) < 0.15
                               ).astype(np.int32),
        "opt_mask": np.ones((gb, nc), bool),
        "ranking_target": np.zeros((gb,), np.int32),
    }
    lo = int(pid) * lb
    local_batch = {k: v[lo:lo + lb] for k, v in gbatch.items()}
    batch = {
        k: multihost_utils.host_local_array_to_global_array(
            v, mesh, P("data", *([None] * (v.ndim - 1))))
        for k, v in local_batch.items()}

    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    state, tx, _ = ts.create_train_state(params, run_args,
                                         steps_per_epoch=10)
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), state)
    bshard = ts.make_batch_shardings(mesh, gbatch)
    step = ts.jit_train_step(ts.build_train_step(cfg, run_args, tx), mesh,
                             jax.tree_util.tree_map(lambda _: repl, state),
                             bshard)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    train_loss = float(metrics["loss/train"])   # replicated: same globally
    # fingerprint of the UPDATED (replicated) params, readable everywhere
    psum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                      for x in jax.tree_util.tree_leaves(p)),
        out_shardings=repl)(state.params)
    params_fingerprint = float(psum)

    out = {
        "train_loss": train_loss,
        "params_fingerprint": params_fingerprint,
        "pid": int(pid),
        "process_count": jax.process_count(),
        "shard": sorted(int(i) for i in shard),
        "indices": sorted(seen),
        "total": total,
        "is_main": D.is_main_process(),
        "world_size": D.world_size(),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous_and_sharding(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    addr = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(REPO_ROOT), addr, str(pid),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    results = [json.load(open(tmp_path / f"result_{pid}.json"))
               for pid in range(2)]

    assert all(r["process_count"] == 2 for r in results)
    assert all(r["world_size"] == 2 for r in results)
    assert results[0]["is_main"] and not results[1]["is_main"]

    # DistributedSampler semantics: equal-size shards, wrap-padded to a
    # multiple of the world size, disjoint except for the pad duplicate,
    # together covering the whole dataset
    a, b = (results[0]["shard"], results[1]["shard"])
    assert len(a) == len(b) == 11           # ceil(21/2) with wrap pad
    assert set(a) | set(b) == set(range(21))
    assert len(set(a) & set(b)) <= 1        # only the single pad index

    # the Loader consumed exactly its own shard (drop_last trims the odd
    # final batch, like reference training)
    for r in results:
        assert len(r["indices"]) == 10
        assert set(r["indices"]) <= set(r["shard"])

    # both processes computed the same global (cross-host) reduction
    expect = float(np.arange(8).sum() * 2 + 100.0 * 8)
    assert results[0]["total"] == results[1]["total"] == expect

    # the cross-process train step produced one GLOBAL loss and identical
    # updated parameters on every controller
    assert results[0]["train_loss"] == results[1]["train_loss"]
    assert np.isfinite(results[0]["train_loss"])
    assert (results[0]["params_fingerprint"]
            == results[1]["params_fingerprint"])
