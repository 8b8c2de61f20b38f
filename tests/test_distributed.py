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

    # ---- engine multi-host batch composition (training/engine.py
    # _multihost_put): per-host loader batches must CONCATENATE into the
    # global step batch along the data axis — a plain device_put with a
    # global NamedSharding would reinterpret each host's LOCAL rows as
    # the GLOBAL batch and silently drop half of every loaded batch ----
    from types import SimpleNamespace
    from youtube_vln_tpu.training.engine import Engine
    from youtube_vln_tpu.parallel.mesh import make_mesh

    emesh = make_mesh(None, ("data", "model"))  # (4,1): data spans procs
    to_host = jax.jit(lambda x: x,
                      out_shardings=NamedSharding(emesh, P()))
    put1 = Engine._multihost_put(SimpleNamespace(mesh=emesh), 1)
    local_rows = {"rows": np.arange(2, dtype=np.float32).reshape(2, 1)
                  + 100.0 * int(pid)}
    merged = np.asarray(to_host(put1(local_rows)["rows"]))
    merged_rows = [float(v) for v in merged[:, 0]]

    # non-divisible eval tail: 3 local rows wrap-pad to the 2-device
    # local extent (DistributedSampler-style duplicate)
    tail = {"rows": np.arange(3, dtype=np.float32).reshape(3, 1)
            + 100.0 * int(pid)}
    gtail = put1(tail)["rows"]
    tail_rows = [float(v) for v in np.asarray(to_host(gtail))[:, 0]]

    # grad-accum layout: axis 0 microbatch (replicated), axis 1 sharded
    put2 = Engine._multihost_put(SimpleNamespace(mesh=emesh), 2)
    g2 = put2({"x": np.zeros((2, 2, 1), np.float32)})["x"]
    accum_shape = list(g2.shape)

    # a mesh whose data coordinates span processes must be REFUSED (two
    # hosts would feed conflicting rows to one batch position)
    bad_mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2).T,
                    ("data", "model"))
    try:
        Engine._multihost_put(SimpleNamespace(mesh=bad_mesh), 1)
        bad_mesh_raises = False
    except ValueError:
        bad_mesh_raises = True

    out = {
        "train_loss": train_loss,
        "params_fingerprint": params_fingerprint,
        "merged_rows": merged_rows,
        "tail_rows": tail_rows,
        "accum_shape": accum_shape,
        "bad_mesh_raises": bad_mesh_raises,
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


# Cross-process Orbax proof (VERDICT r3 missing #3): ``save_orbax`` claims
# "every host writes its own shards".  This worker runs on a 2-process
# {data:2, model:2} mesh whose MODEL axis spans the two processes (device
# array [[0, 2], [1, 3]]), so Megatron-sharded params have shards on BOTH
# hosts — the save is a genuine cross-host collective, not a host-0
# gather.  Phase "save": one optimizer update, fingerprint, save.  Phase
# "restore" (a FRESH 2-process rendezvous): rebuild differently-seeded
# state, restore into mesh shardings, fingerprint must match the saved
# state on both ranks, and the restored state must take another step.
ORBAX_WORKER = textwrap.dedent("""
    import json, os, sys
    repo, addr, pid, outdir, phase = sys.argv[1:6]
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from youtube_vln_tpu.parallel import distributed as D
    D.initialize(coordinator_address=addr, num_processes=2,
                 process_id=int(pid))

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from youtube_vln_tpu.config import tiny_config, RunConfig
    from youtube_vln_tpu.models import init_lily_params
    from youtube_vln_tpu.parallel import train_step as ts
    from youtube_vln_tpu.parallel.mesh import param_shardings
    from youtube_vln_tpu.training import checkpoint as ckpt

    assert jax.process_count() == 2 and jax.device_count() == 4

    # model axis SPANS the processes: row-major device array
    # [[d0, d2], [d1, d3]] puts one model shard on each host
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2).T,
                ("data", "model"))

    cfg = tiny_config(ranking=True, masked_language=True)
    run_args = RunConfig(ranking=True, masked_language=True, pretrain=True,
                         learning_rate=1e-4, num_epochs=1)
    seed = 0 if phase == "save" else 9
    params = init_lily_params(jax.random.PRNGKey(seed), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    shardings = param_shardings(mesh, params, cfg)

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    params = jax.tree_util.tree_map(put, params, shardings)
    # at least one Megatron-sharded leaf must be split across hosts
    n_model_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        if "model" in str(s.spec))
    assert n_model_sharded > 0, "TP plan inert - test proves nothing"

    state, tx, _ = ts.create_train_state(params, run_args,
                                         steps_per_epoch=10)

    # tx.init creates scalar leaves (e.g. the schedule count) eagerly on
    # the default device; as a restore TEMPLATE they must carry a
    # mesh-wide sharding or orbax restores them committed to device 0,
    # which then cannot be mixed with mesh-sharded params in one jit
    all_devs = set(mesh.devices.flat)

    def mesh_wide(x):
        if (isinstance(x, jax.Array)
                and set(x.sharding.device_set) != all_devs):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, NamedSharding(mesh, P(*([None] * arr.ndim))),
                lambda idx: arr[idx])
        return x

    state = ts.TrainState(state.params,
                          jax.tree_util.tree_map(mesh_wide, state.opt_state),
                          mesh_wide(state.step))

    @jax.jit
    def bump(state):
        grads = jax.tree_util.tree_map(lambda p: 0.01 * p, state.params)
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        return ts.TrainState(optax.apply_updates(state.params, upd),
                             new_opt, state.step + 1)

    repl = NamedSharding(mesh, P())

    def fingerprint(tree):
        def total(t):
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(t)
                       if jnp.issubdtype(l.dtype, jnp.floating))
        return float(jax.jit(total, out_shardings=repl)(tree))

    ckpt_dir = os.path.join(outdir, "orbax_ckpt")
    if phase == "save":
        state = bump(state)
        ckpt.save_orbax(ckpt_dir, state.params, state.opt_state,
                        step=int(state.step), epoch=3)
        out = {"pid": int(pid),
               "params_fp": fingerprint(state.params),
               "opt_fp": fingerprint(state.opt_state)}
    else:
        template = {"params": state.params,
                    "opt_state": state.opt_state, "step": 0, "epoch": 0}
        payload = ckpt.load_orbax(ckpt_dir, template)
        assert int(payload["step"]) == 1, payload["step"]
        assert int(payload["epoch"]) == 3, payload["epoch"]
        # restored leaves landed in the mesh shardings (not replicated)
        flat_r = jax.tree_util.tree_leaves(payload["params"])
        flat_s = jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        assert any("model" in str(a.sharding.spec) for a in flat_r)
        for arr, sh in zip(flat_r, flat_s):
            assert arr.sharding.spec == sh.spec, (arr.sharding, sh)
        restored = ts.TrainState(payload["params"], payload["opt_state"],
                                 jnp.asarray(int(payload["step"]),
                                             jnp.int32))
        out = {"pid": int(pid),
               "params_fp": fingerprint(restored.params),
               "opt_fp": fingerprint(restored.opt_state)}
        # the restored state must be trainable (shardings compose with
        # the optimizer step across both controllers)
        stepped = bump(restored)
        out["stepped_fp"] = fingerprint(stepped.params)
        assert np.isfinite(out["stepped_fp"])
    with open(os.path.join(outdir, f"orbax_{phase}_{pid}.json"),
              "w") as f:
        json.dump(out, f)
""")


def _run_two_procs(script_path, tmp_path, extra_args=()):
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               HF_HUB_OFFLINE="1", TRANSFORMERS_OFFLINE="1")
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script_path), str(REPO_ROOT), addr, str(pid),
         str(tmp_path), *extra_args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]


def test_two_process_orbax_save_restore(tmp_path):
    """save_orbax/load_orbax across two controllers with Megatron shards
    split across the hosts; a fresh process pair resumes bit-identically
    (reference resume semantics utils/utils_init.py:277-295 at multi-host
    scale)."""
    worker = tmp_path / "orbax_worker.py"
    worker.write_text(ORBAX_WORKER)

    _run_two_procs(worker, tmp_path, ("save",))
    saved = [json.load(open(tmp_path / f"orbax_save_{pid}.json"))
             for pid in range(2)]
    assert saved[0]["params_fp"] == saved[1]["params_fp"]
    assert saved[0]["opt_fp"] == saved[1]["opt_fp"]

    _run_two_procs(worker, tmp_path, ("restore",))
    restored = [json.load(open(tmp_path / f"orbax_restore_{pid}.json"))
                for pid in range(2)]
    assert restored[0]["params_fp"] == restored[1]["params_fp"]
    assert restored[0]["stepped_fp"] == restored[1]["stepped_fp"]
    # cross-phase: the fresh processes restored the saved state exactly
    assert restored[0]["params_fp"] == saved[0]["params_fp"]
    assert restored[0]["opt_fp"] == saved[0]["opt_fp"]


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
    outs = [p.communicate(timeout=600) for p in procs]
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

    # engine _multihost_put: the global batch is the CONCATENATION of both
    # hosts' loader batches (host 0 rows then host 1 rows on this mesh) —
    # the regression it pins is device_put dropping (world-1)/world of
    # every loaded batch
    for r in results:
        assert r["merged_rows"] == [0.0, 1.0, 100.0, 101.0]
        # 3-row eval tail wrap-pads per host: [0,1,2,0] ++ [100,101,102,100]
        assert r["tail_rows"] == [0.0, 1.0, 2.0, 0.0,
                                  100.0, 101.0, 102.0, 100.0]
        assert r["accum_shape"] == [2, 4, 1]   # microbatch axis replicated
        assert r["bad_mesh_raises"]


# Entry-level orbax wiring (r5 review finding): engine.save with
# --orbax_checkpoints is a cross-host COLLECTIVE, but both entry points
# used to call it only on is_main, with save_folder=None on non-main —
# host 0 would hang at the orbax barrier forever.  This worker runs the
# REAL pretrain.py entry (argv -> initialize() env-resolution -> Engine ->
# collective save) on both processes against a shared fixture.
ENTRY_ORBAX_WORKER = textwrap.dedent("""
    import importlib.util, json, os, sys
    repo, addr, pid, outdir = sys.argv[1:5]
    # the entry resolves these itself via parallel.distributed.initialize
    os.environ["COORDINATOR_ADDRESS"] = addr
    os.environ["WORLD_SIZE"] = "2"
    os.environ["RANK"] = pid

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "pretrain_entry", os.path.join(repo, "pretrain.py"))
    pretrain = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pretrain)

    paths = json.load(open(os.path.join(outdir, "fixture.json")))
    best = pretrain.main([
        "--max_instruction_length", "32", "--max_path_length", "4",
        "--max_num_boxes", "5", "--min_path_length", "3",
        "--min_captioned", "2", "--max_captioned", "4",
        "--compute_dtype", "float32", "--num_epochs", "1",
        "--learning_rate", "1e-4", "--batch_size", "4",
        "--num_workers", "0",
        "--data_dir", paths["data_dir"],
        "--bert_tokenizer", paths["vocab_path"],
        "--config_file", paths["config_file"],
        "--from_pretrained", "",
        "--ytb_feature", paths["ytb_store"],
        "--skeleton_path", paths["skeleton_path"],
        "--output_dir", os.path.join(outdir, "result"),
        "--pre_dataset", "ytb", "--prefix", "merge+",
        "--ranking", "--skip_val",
        "--orbax_checkpoints", "--save_epochs", "1",
        "--save_name", "dist_orbax"])
    assert jax.process_count() == 2, jax.process_count()
    print("ENTRY_OK", pid)
""")


def test_two_process_entry_orbax_save(tmp_path):
    """pretrain.py end-to-end on a 2-process mesh with --orbax_checkpoints:
    the periodic save must complete as a collective (both processes enter
    engine.save) instead of deadlocking host 0 at the orbax barrier, and
    the sharded checkpoint must land at the shared data path."""
    from youtube_vln_tpu.data import fixtures as F

    data_dir = tmp_path / "data"
    paths = F.build_full_fixture(data_dir)
    with open(tmp_path / "fixture.json", "w") as fh:
        json.dump({k: str(v) for k, v in paths.items()}, fh)

    worker = tmp_path / "entry_orbax_worker.py"
    worker.write_text(ENTRY_ORBAX_WORKER)
    _run_two_procs(worker, tmp_path)

    saved = tmp_path / "result" / "dist_orbax" / "data" / "0.orbax"
    assert saved.is_dir(), list((tmp_path / "result").rglob("*"))[:20]
