"""Checkpointing.

Save format is a torch ``.bin`` interop-compatible with the reference
(``utils/utils_init.py:277-295``): ``model_state_dict`` uses the exact
reference key layout (loadable by the original PyTorch code), plus
``jax_optimizer_state`` / ``jax_step`` for our optimizer resume and
``epoch``.  Loading accepts:

  * our own checkpoints (full resume)
  * reference checkpoints — raw state dicts, ``model_state_dict`` wrappers,
    ViLBERT Conceptual-Captions dumps without the ``bert.`` prefix,
    gamma/beta legacy names (vilbert/vilbert.py:1098-1160)

``delete_checkpoint`` prunes old epochs like the reference
(utils_init.py:297-300).
"""
from __future__ import annotations

import io
import logging
import os
import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import LilyConfig
from ..models import torch_io

logger = logging.getLogger(__name__)


def checkpoint_path(save_dir, save_name) -> str:
    return os.path.join(save_dir, f"{save_name}.bin")


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# exact globals the pickled optimizer tree may reference: numpy array /
# scalar reconstruction, the dict containers, and our optimizer state
# NamedTuple.  Everything is converted to numpy before pickling
# (_tree_to_numpy), so no jax types appear.
_OPT_STATE_ALLOWED = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.dtypes", "Float32DType"),
    ("numpy.dtypes", "Int32DType"),
    ("collections", "OrderedDict"),
    ("youtube_vln_tpu.training.optimization", "AdamWRefState"),
}


class _OptStateUnpickler(pickle.Unpickler):
    """Allowlisted unpickler for the embedded ``jax_optimizer_state``
    blob.  The outer checkpoint reader (models/torch_serialization.py)
    rejects arbitrary globals, and a plain pickle.loads here would
    reopen exactly that hole through a crafted bytes payload."""

    def find_class(self, module, name):
        if (module, name) in _OPT_STATE_ALLOWED or (
                module.startswith("numpy.dtypes") and name.endswith("DType")):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"jax_optimizer_state references disallowed global "
            f"'{module}.{name}' — extend _OPT_STATE_ALLOWED if the "
            f"optimizer tree legitimately contains it")


def _loads_opt_state(data: bytes):
    return _OptStateUnpickler(io.BytesIO(data)).load()


def save_checkpoint(save_dir, save_name, params, cfg: LilyConfig,
                    opt_state=None, step: int = 0, epoch: int = 0) -> str:
    path = checkpoint_path(save_dir, save_name)
    extra: Dict[str, Any] = {"epoch": epoch, "jax_step": int(step)}
    if opt_state is not None:
        buf = io.BytesIO()
        pickle.dump(_tree_to_numpy(opt_state), buf)
        extra["jax_optimizer_state"] = buf.getvalue()
    torch_io.save_torch_checkpoint(path, _tree_to_numpy(params), cfg,
                                   extra=extra)
    return path


def resolve_pretrained(path_or_url) -> Tuple[str, Optional[str]]:
    """Reference ``from_pretrained`` path semantics (vilbert.py:1014-1093):
    URLs go through cached_path; a directory means ``<dir>/
    pytorch_model.bin``; a ``*bin`` file is used as-is; anything else is
    treated as a ``.tar.gz`` archive and extracted to a temp dir whose
    ``pytorch_model.bin`` is loaded.  Returns (weights_path, tempdir) —
    the caller removes tempdir (if not None) after loading."""
    import tarfile
    import tempfile

    path = str(path_or_url)
    if "://" in path:
        from ..utils.file_cache import cached_path
        # cached_path returns a Path; the suffix checks below need str
        resolved = os.fspath(cached_path(path))
        logger.info("loading archive file %s from cache at %s", path,
                    resolved)
    else:
        resolved = path
    if os.path.isdir(resolved):
        return os.path.join(resolved, "pytorch_model.bin"), None
    if resolved.endswith((".bin", ".pth", ".pt")):
        return resolved, None
    # a missing path is a path problem, not a format problem — report it
    # before the tar branch can fold it into "not a recognized checkpoint"
    if not os.path.exists(resolved):
        raise FileNotFoundError(
            f"checkpoint not found: {resolved!r} (from --from_pretrained "
            f"{path!r})")
    tempdir = tempfile.mkdtemp()
    logger.info("extracting archive file %s to temp dir %s", resolved,
                tempdir)
    try:
        with tarfile.open(resolved, "r:gz") as archive:
            archive.extractall(tempdir, filter="data")
    except (tarfile.ReadError, OSError) as e:
        import shutil
        shutil.rmtree(tempdir, ignore_errors=True)
        raise ValueError(
            f"{resolved}: not a recognized checkpoint — expected a weights "
            "file (.bin/.pth/.pt), a directory holding pytorch_model.bin, "
            f"or a .tar.gz archive of one ({e})") from e
    return os.path.join(tempdir, "pytorch_model.bin"), tempdir


def load_checkpoint(path, cfg: LilyConfig, params,
                    ) -> Tuple[Any, Optional[Any], int, int]:
    """Returns (params, opt_state_or_None, step, epoch).

    ``path`` may be a ``.bin`` file, a directory holding
    ``pytorch_model.bin``, a ``.tar.gz`` archive (the published ViLBERT
    Conceptual-Captions distribution format), or a URL to any of those."""
    import shutil

    from ..models import torch_serialization

    weights_path, tempdir = resolve_pretrained(path)
    try:
        payload = torch_serialization.load(weights_path)
    finally:
        if tempdir:
            shutil.rmtree(tempdir, ignore_errors=True)
    params, missing, unexpected = torch_io.state_dict_to_params(
        payload if isinstance(payload, dict) else payload.state_dict(),
        cfg, params)
    if missing:
        logger.info("checkpoint %s: %d params kept initialization (e.g. %s)",
                    path, len(missing), missing[0])
    real_unexpected = [k for k in unexpected
                       if "q_dense" not in k
                       and k not in ("epoch", "jax_step",
                                     "jax_optimizer_state",
                                     "optimizer_state_dict",
                                     "scheduler_state_dict")]
    if real_unexpected:
        logger.info("checkpoint %s: %d unused entries (e.g. %s)", path,
                    len(real_unexpected), real_unexpected[0])

    opt_state = None
    step = 0
    epoch = -1
    if isinstance(payload, dict):
        if "jax_optimizer_state" in payload:
            opt_state = _loads_opt_state(payload["jax_optimizer_state"])
        step = int(payload.get("jax_step", 0))
        epoch = int(payload.get("epoch", -1))
    return params, opt_state, step, epoch


def delete_checkpoint(save_dir, save_name) -> None:
    path = checkpoint_path(save_dir, save_name)
    if os.path.exists(path):
        os.unlink(path)
    orbax_dir = os.path.join(save_dir, f"{save_name}.orbax")
    if os.path.isdir(orbax_dir):
        import shutil
        shutil.rmtree(orbax_dir, ignore_errors=True)


def is_orbax_checkpoint(path) -> bool:
    """True when ``path`` is a directory written by :func:`save_orbax`
    (an OCDBT manifest or per-array subdirs with Zarr/TS metadata),
    as opposed to a ``from_pretrained`` directory holding a torch
    ``pytorch_model.bin``."""
    p = Path(path)
    if not p.is_dir():
        return False
    if (p / "pytorch_model.bin").exists():
        return False
    markers = ("manifest.ocdbt", "_CHECKPOINT_METADATA", "_METADATA",
               "ocdbt.process_0", "zarr.json", ".zarray")
    return any((p / m).exists() for m in markers)


# --------------------------------------------------------------------------- #
# Orbax (sharded, multi-host-safe) checkpoints
# --------------------------------------------------------------------------- #
def save_orbax(directory, params, opt_state=None, step: int = 0,
               epoch: int = 0) -> str:
    """Sharded async-safe checkpoint for multi-host runs; every host writes
    its own shards (no gather to host 0, unlike the .bin path).  Use the
    .bin path for reference interop, this one for production scale."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params, "step": step, "epoch": epoch}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(directory, payload, force=True)
    ckptr.wait_until_finished()
    return str(directory)


def orbax_entries(directory) -> Optional[set]:
    """Top-level entry names of an Orbax checkpoint (None if metadata is
    unreadable).  Orbax restore rejects BOTH missing and extra template
    keys, so callers must intersect their template with what is actually
    on disk (e.g. a param-only save has no ``opt_state`` entry)."""
    import orbax.checkpoint as ocp

    try:
        md = ocp.StandardCheckpointer().metadata(Path(directory).resolve())
    except Exception:
        return None
    tree = getattr(getattr(md, "item_metadata", None), "tree", None)
    if tree is not None:
        return set(tree.keys())
    if hasattr(md, "keys"):
        return set(md.keys())
    return None


def load_orbax(directory, template) -> Dict[str, Any]:
    """``template`` is a pytree of arrays (shapes/dtypes/shardings to
    restore into); top-level entries absent from the checkpoint are
    dropped from the template (and therefore from the result) rather
    than failing the whole restore."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    # drop template entries the checkpoint does not have (restore rejects
    # them even under partial_restore, which only tolerates the converse)
    avail = orbax_entries(directory)
    partial = False
    if avail is not None and isinstance(template, dict):
        template = {k: v for k, v in template.items() if k in avail}
        partial = set(template) != avail
    if not partial:
        return ocp.StandardCheckpointer().restore(directory, template)
    # template is a strict subset of the on-disk entries (e.g. the
    # engine's non-resume path reads params but not the optimizer
    # shards): partial_restore lives on the PyTree handler
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        return ckptr.restore(
            directory,
            args=ocp.args.PyTreeRestore(item=template,
                                        restore_args=restore_args,
                                        partial_restore=True))
