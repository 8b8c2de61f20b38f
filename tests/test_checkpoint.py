"""Checkpoint format interop without a torch dependency.

training/checkpoint.py + models/torch_serialization.py must produce and
consume the reference's torch ``.bin`` format (utils/utils_init.py:277-295)
with torch absent: the writer's output loads under real ``torch.load``
(including the restricted ``weights_only=True`` unpickler), real
``torch.save`` output (zip AND pre-1.6 legacy) loads through our reader,
and the ``from_pretrained`` archive surface (dir / .bin / .tar.gz,
reference vilbert/vilbert.py:1014-1093) resolves correctly.
"""
import io
import json
import pickle
import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

import jax

from youtube_vln_tpu.config import tiny_config
from youtube_vln_tpu.models import init_lily_params
from youtube_vln_tpu.models import torch_serialization as tser
from youtube_vln_tpu.models.torch_io import params_to_state_dict
from youtube_vln_tpu.training import checkpoint as ckpt


@pytest.fixture(scope="module")
def cfg():
    return tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                       masked_language=True)


@pytest.fixture(scope="module")
def params(cfg):
    return jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(3), cfg))


def _params_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(b)}
    for k, v in fa:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(fb[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


def test_writer_loads_under_torch_weights_only(tmp_path, cfg, params):
    torch = pytest.importorskip("torch")
    path = ckpt.save_checkpoint(tmp_path, "interop", params, cfg, epoch=4)
    payload = torch.load(path, weights_only=True)
    assert payload["epoch"] == 4
    sd = payload["model_state_dict"]
    expected = params_to_state_dict(params, cfg)
    assert set(sd) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(sd[k].numpy(), expected[k], err_msg=k)
    # tied MLM decoder shares one storage, exactly like torch.save output
    assert (sd["cls.predictions.decoder.weight"].data_ptr()
            == sd["bert.embeddings.word_embeddings.weight"].data_ptr())


def test_reader_consumes_torch_save_zip(tmp_path, cfg, params):
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_state_dict(params, cfg).items()}
    path = tmp_path / "ref_style.bin"
    torch.save({"model_state_dict": sd, "epoch": 9}, path)

    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(11), cfg))
    loaded, _, _, epoch = ckpt.load_checkpoint(str(path), cfg, fresh)
    assert epoch == 9
    _params_equal(params, loaded)


def test_reader_consumes_torch_legacy_format(tmp_path, cfg, params):
    """Pre-1.6 serialization — the published 2019-era ViLBERT CC archive
    ships this format."""
    torch = pytest.importorskip("torch")
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_state_dict(params, cfg).items()}
    path = tmp_path / "legacy.bin"
    torch.save({"model_state_dict": sd}, path,
               _use_new_zipfile_serialization=False)

    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(11), cfg))
    loaded, _, _, _ = ckpt.load_checkpoint(str(path), cfg, fresh)
    _params_equal(params, loaded)


def test_full_resume_roundtrip_pure_python(tmp_path, cfg, params):
    """save -> load entirely through our code path: params, optimizer
    state, step and epoch all survive."""
    opt_state = {"mu": jax.tree_util.tree_map(np.zeros_like, params),
                 "count": np.int32(17)}
    path = ckpt.save_checkpoint(tmp_path, "resume", params, cfg,
                                opt_state=opt_state, step=170, epoch=2)
    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(11), cfg))
    loaded, opt, step, epoch = ckpt.load_checkpoint(path, cfg, fresh)
    assert (step, epoch) == (170, 2)
    assert int(opt["count"]) == 17
    _params_equal(params, loaded)


def test_targz_archive_resolution(tmp_path, cfg, params):
    """HF-style .tar.gz archives (bert_config.json + pytorch_model.bin)
    extract to a temp dir, load, and clean up — vilbert.py:1080-1093."""
    inner = tmp_path / "payload"
    inner.mkdir()
    tser.save({"model_state_dict": params_to_state_dict(params, cfg)},
              inner / "pytorch_model.bin")
    (inner / "bert_config.json").write_text(json.dumps({"vocab_size": 256}))
    archive = tmp_path / "model.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(inner / "pytorch_model.bin", arcname="pytorch_model.bin")
        tf.add(inner / "bert_config.json", arcname="bert_config.json")

    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(11), cfg))
    loaded, _, _, _ = ckpt.load_checkpoint(str(archive), cfg, fresh)
    _params_equal(params, loaded)
    # the extraction tempdir is removed after loading
    import tempfile
    leftovers = [p for p in Path(tempfile.gettempdir()).glob("tmp*")
                 if (p / "pytorch_model.bin").exists()]
    assert not leftovers


def test_directory_resolution(tmp_path, cfg, params):
    d = tmp_path / "served_model"
    d.mkdir()
    tser.save({"model_state_dict": params_to_state_dict(params, cfg)},
              d / "pytorch_model.bin")
    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(11), cfg))
    loaded, _, _, _ = ckpt.load_checkpoint(str(d), cfg, fresh)
    _params_equal(params, loaded)


def test_checkpoint_path_works_with_torch_blocked(tmp_path):
    """VERDICT r2 item 6: the save/load path must run with torch
    unimportable (TPU hosts don't ship it).  A meta-path blocker makes
    any ``import torch`` raise, then a tiny save+load round-trips."""
    script = r"""
import sys

class _Block:
    def find_spec(self, name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
        return None

sys.meta_path.insert(0, _Block())
sys.path.insert(0, {repo!r})

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from youtube_vln_tpu.config import tiny_config
from youtube_vln_tpu.models import init_lily_params
from youtube_vln_tpu.training import checkpoint as ckpt

cfg = tiny_config(ranking=True, traj_judge=True, masked_vision=True,
                  masked_language=True)
params = jax.tree_util.tree_map(
    np.asarray, init_lily_params(jax.random.PRNGKey(3), cfg))
path = ckpt.save_checkpoint({out!r}, "blocked", params, cfg, epoch=1)
fresh = jax.tree_util.tree_map(
    np.asarray, init_lily_params(jax.random.PRNGKey(9), cfg))
loaded, _, _, epoch = ckpt.load_checkpoint(path, cfg, fresh)
assert epoch == 1
a = jax.tree_util.tree_leaves(params)
b = jax.tree_util.tree_leaves(loaded)
assert all(np.array_equal(x, y) for x, y in zip(a, b))
print("TORCH_FREE_OK")
""".format(repo=str(Path(__file__).resolve().parent.parent),
           out=str(tmp_path))
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/tmp"}
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=300)
    assert "TORCH_FREE_OK" in proc.stdout, proc.stderr[-3000:]


def test_unknown_global_rejected(tmp_path):
    """The reader must refuse arbitrary-code pickles (weights_only
    hygiene), not execute them."""
    evil = io.BytesIO()

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    payload = pickle.dumps({"x": Evil()}, protocol=2)
    import zipfile
    path = tmp_path / "evil.bin"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("evil/data.pkl", payload)
        zf.writestr("evil/version", "3\n")
    with pytest.raises(pickle.UnpicklingError):
        tser.load(path)
    del evil


def test_legacy_header_pickles_are_restricted(tmp_path):
    """The legacy-format header pickles (magic, protocol, sys-info, keys)
    are read BEFORE the magic check can reject a non-checkpoint file, so
    they must ride a restricted unpickler too: a crafted file whose first
    pickle reduces to a callable must raise, not execute."""
    ran = []

    class Evil:
        def __reduce__(self):
            return (ran.append, ("pwned",))

    path = tmp_path / "evil_legacy.bin"
    path.write_bytes(pickle.dumps(Evil(), protocol=2))
    with pytest.raises(pickle.UnpicklingError):
        tser.load(path)
    assert ran == []   # the payload never executed


def test_corrupt_tensor_extents_rejected():
    """A tensor view reaching past its storage must raise, not silently
    read out-of-bounds heap memory through as_strided."""
    ref = tser._StorageRef(np.dtype(np.float32), "0", 4,
                           lambda r: b"\x00" * 16)
    with pytest.raises(ValueError):
        tser._rebuild_tensor_v2(ref, 0, (1000,), (1,))     # size overflow
    with pytest.raises(ValueError):
        tser._rebuild_tensor_v2(ref, 2, (4,), (1,))        # offset overflow
    with pytest.raises(ValueError):
        tser._rebuild_tensor_v2(ref, 0, (2, 2), (1000, 1))  # stride overflow
    with pytest.raises(ValueError):
        tser._rebuild_tensor_v2(ref, 0, (4,), (-1,))       # negative stride
    ok = tser._rebuild_tensor_v2(ref, 0, (2, 2), (2, 1))   # exact fit
    assert ok.shape == (2, 2)
    empty = tser._rebuild_tensor_v2(ref, 0, (0,), (1,))    # 0-size: no read
    assert empty.shape == (0,)


def test_url_checkpoint_resolves_through_offline_cache(tmp_path, monkeypatch):
    """--from_pretrained <url> resolves via the file cache (reference
    vilbert.py:1014-1041); regression: cached_path returns a Path and the
    suffix checks crashed with AttributeError before reaching the tar
    branch."""
    import shutil

    from youtube_vln_tpu.utils import file_cache

    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setattr(file_cache, "CACHE_DIR", cache)

    bin_path = tmp_path / "pytorch_model.bin"
    tser.save({"model_state_dict": {}}, bin_path)
    tgz = tmp_path / "m.tar.gz"
    with tarfile.open(tgz, "w:gz") as t:
        t.add(bin_path, arcname="pytorch_model.bin")
    url = "https://example.com/release/model.tar.gz"
    shutil.copy(tgz, cache / file_cache.url_to_filename(url))

    weights, tempdir = ckpt.resolve_pretrained(url)
    try:
        assert tempdir is not None
        assert weights.endswith("pytorch_model.bin")
        assert Path(weights).exists()
    finally:
        if tempdir:
            shutil.rmtree(tempdir, ignore_errors=True)


def test_offline_cache_finds_etag_named_entry(tmp_path):
    """A file a previous ONLINE run stored under its etag-suffixed cache
    name must still resolve in a later offline run (etag unavailable)."""
    from youtube_vln_tpu.utils import file_cache as fc

    url = "https://example.com/f.bin"
    name = fc.url_to_filename(url, "etag-123")
    (tmp_path / name).write_bytes(b"payload")
    (tmp_path / (name + ".json")).write_text(
        json.dumps({"url": url, "etag": "etag-123"}))
    got = fc.get_from_cache(url, cache_dir=tmp_path, allow_download=False)
    assert got.name == name
    with pytest.raises(FileNotFoundError):
        fc.get_from_cache("https://example.com/other.bin",
                          cache_dir=tmp_path, allow_download=False)


def test_orbax_sharded_save_restore_dp4_tp2(tmp_path, cfg):
    """VERDICT r2 item 4: sharded (Orbax) checkpointing under a DP4xTP2
    mesh — save from live device state without a host-0 gather, restore
    directly into the mesh shardings, optimizer state and step included."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from youtube_vln_tpu.config import RunConfig
    from youtube_vln_tpu.parallel import train_step as ts
    from youtube_vln_tpu.parallel.mesh import (make_mesh, param_shardings,
                                               shard_params)

    args = RunConfig(ranking=True, traj_judge=True, masked_vision=True,
                     masked_language=True, pretrain=True,
                     learning_rate=1e-4, num_epochs=1)
    mesh = make_mesh((4, 2))
    params = init_lily_params(jax.random.PRNGKey(0), cfg)
    shardings = param_shardings(mesh, params, cfg)
    state, _, _ = ts.create_train_state(shard_params(params, shardings),
                                        args, steps_per_epoch=4)

    path = ckpt.save_orbax(tmp_path / "ck.orbax", state.params,
                           opt_state=state.opt_state, step=5, epoch=1)
    assert ckpt.is_orbax_checkpoint(path)
    assert not ckpt.is_orbax_checkpoint(tmp_path)  # plain dir is not

    fresh = shard_params(init_lily_params(jax.random.PRNGKey(9), cfg),
                         shardings)
    state2, _, _ = ts.create_train_state(fresh, args, steps_per_epoch=4)
    payload = ckpt.load_orbax(path, {"params": state2.params,
                                     "opt_state": state2.opt_state,
                                     "step": 0, "epoch": 0})
    assert int(payload["step"]) == 5 and int(payload["epoch"]) == 1

    ref = jax.tree_util.tree_leaves_with_path(state.params)
    got = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(payload["params"])}
    n_tp_sharded = 0
    for k, v in ref:
        r = got[jax.tree_util.keystr(k)]
        np.testing.assert_array_equal(np.asarray(v), np.asarray(r),
                                      err_msg=jax.tree_util.keystr(k))
        assert r.sharding == v.sharding, jax.tree_util.keystr(k)
        if any(ax == "model" for s in r.sharding.spec if s
               for ax in (s if isinstance(s, tuple) else (s,))):
            n_tp_sharded += 1
    assert n_tp_sharded > 0, "no TP-sharded leaf restored sharded"


def test_orbax_param_only_and_non_resume_templates(tmp_path, cfg, params):
    """Orbax restore rejects BOTH missing and extra template entries, so
    load_orbax intersects the template with what is on disk: a
    param-only save still loads, and a full checkpoint can be read with
    a params-only template (the engine's non-resume path skips the
    optimizer shards)."""
    path = ckpt.save_orbax(tmp_path / "params_only.orbax", params)
    out = ckpt.load_orbax(path, {"params": params,
                                 "opt_state": {"mu": params},
                                 "step": 0, "epoch": 0})
    assert set(out) == {"params", "step", "epoch"}
    _params_equal(params, out["params"])

    full = ckpt.save_orbax(tmp_path / "full.orbax", params,
                           opt_state={"mu": params}, step=3, epoch=1)
    assert ckpt.orbax_entries(full) == {"params", "opt_state", "step",
                                        "epoch"}
    out = ckpt.load_orbax(full, {"params": params})
    assert set(out) == {"params"}
    _params_equal(params, out["params"])


def test_opt_state_blob_rejects_malicious_pickle(tmp_path, cfg, params):
    """The embedded jax_optimizer_state blob goes through an allowlisted
    unpickler — a crafted payload must not execute (the outer restricted
    reader would otherwise be bypassed through an innocent bytes
    field)."""
    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    payload = {"model_state_dict": {}, "epoch": 0,
               "jax_optimizer_state": pickle.dumps(Evil(), protocol=2)}
    path = tmp_path / "evil_opt.bin"
    tser.save(payload, path)
    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(1), cfg))
    with pytest.raises(pickle.UnpicklingError, match="disallowed global"):
        ckpt.load_checkpoint(str(path), cfg, fresh)


def test_tied_decoder_export_shares_storage(tmp_path, cfg):
    """The tied MLM decoder must be exported as the SAME array object as
    the word embedding (r5 review finding): with device-resident params,
    np.asarray materializes a fresh numpy array per call, defeating the
    pickler's id()-based dedup and writing the 30522x768 embedding twice
    (~94 MB/checkpoint at flagship).  torch.load must see one shared
    storage, like torch.save produces for tied weights."""
    torch = pytest.importorskip("torch")
    # device-resident leaves — the case where the old code forked storage
    dev_params = jax.tree_util.tree_map(
        jax.numpy.asarray, init_lily_params(jax.random.PRNGKey(5), cfg))
    sd = params_to_state_dict(dev_params, cfg)
    assert sd["cls.predictions.decoder.weight"] is \
        sd["bert.embeddings.word_embeddings.weight"]

    path = ckpt.save_checkpoint(tmp_path, "tied", dev_params, cfg, epoch=0)
    loaded = torch.load(path, weights_only=True)["model_state_dict"]
    assert (loaded["cls.predictions.decoder.weight"].data_ptr()
            == loaded["bert.embeddings.word_embeddings.weight"].data_ptr())


def test_partial_entry_loads_present_tensor(cfg, params):
    """A checkpoint holding a mapped linear's weight but not its bias must
    still restore the weight, report only the bias missing, and not list
    the weight as unexpected (the reference's non-strict per-tensor load,
    vilbert.py:1161-1172; r5 review finding — the whole entry was skipped
    and the weight flagged 'unexpected')."""
    from youtube_vln_tpu.models.torch_io import state_dict_to_params

    full = params_to_state_dict(params, cfg)
    key = "bert.encoder.layer.0.attention.self.query.weight"
    partial = {key: full[key] + 1.0}   # distinct from init
    fresh = jax.tree_util.tree_map(
        np.asarray, init_lily_params(jax.random.PRNGKey(9), cfg))
    out, missing, unexpected = state_dict_to_params(partial, cfg, fresh)
    np.testing.assert_array_equal(
        out["text_layers"][0]["attn"]["query"]["w"], partial[key].T)
    assert key.replace("weight", "bias") in missing
    assert key not in unexpected
