"""Test environment: force an 8-device CPU mesh and offline mode.

Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session default may be a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import sys
import types
from pathlib import Path

import jax
import numpy as np
import pytest

# The axon site-hook pins JAX_PLATFORMS=axon at interpreter start; the env
# var alone does not stick, the config update does.
jax.config.update("jax_platforms", "cpu")
# bit-parity tests need full f32 matmuls everywhere
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")

# build the native store reader if missing (it is a build artifact,
# not committed)
_native = REPO_ROOT / "native" / "libvlnstore.so"
if not _native.exists():
    import subprocess
    subprocess.run(["make", "-C", str(REPO_ROOT / "native")], check=False)


def import_reference_vilbert():
    """Import the reference PyTorch model (read-only) for parity checks.

    Stubs out its unused download deps (boto3/botocore/requests)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import importlib.machinery
    for m in ("boto3", "requests", "botocore", "botocore.exceptions"):
        if m not in sys.modules:
            mod = types.ModuleType(m)
            # a real-looking spec keeps importlib.util.find_spec() happy
            # (transformers probes optional deps that way)
            mod.__spec__ = importlib.machinery.ModuleSpec(m, loader=None)
            if m == "botocore.exceptions":
                mod.ClientError = Exception
            sys.modules[m] = mod
    import vilbert.vilbert as ref_vilbert  # noqa
    return ref_vilbert


def prepare_reference_runtime():
    """Everything the live loop-parity tests need before importing the
    reference datasets + training utilities: the common-module stubs
    plus an ``inspect.ArgSpec`` shim (removed in py3.11;
    all_dataset.py:1 imports it).  Returns the reference common module."""
    ref_common = import_reference_common()
    import collections
    import inspect
    if not hasattr(inspect, "ArgSpec"):
        inspect.ArgSpec = collections.namedtuple(
            "ArgSpec", "args varargs keywords defaults")
    return ref_common


def import_reference_common():
    """Import the reference's utils.dataset.common (sampling, masking,
    instruction machinery) for parity checks.  Needs more stubbing than
    the model import: transformers pulls huggingface_hub (real requests),
    features_reader pulls lmdb (faked), plus pyfiglet/argtyped/tqdm-side
    imports of the scripts package."""
    import_reference_vilbert()
    # transformers -> huggingface_hub needs requests.exceptions, which the
    # bare stub installed by import_reference_vilbert lacks.  A prior
    # reference-importing test may have ALREADY installed the stub, so
    # evict it and load the real package (order-independent).
    stub = sys.modules.get("requests")
    if stub is not None and getattr(getattr(stub, "__spec__", None),
                                    "loader", None) is None:
        del sys.modules["requests"]
    import requests  # noqa: F401

    import fake_lmdb
    fake_lmdb.install()
    sys.modules.setdefault("pyfiglet", types.ModuleType("pyfiglet"))
    sys.modules["pyfiglet"].figlet_format = lambda *a, **k: ""
    if "argtyped" not in sys.modules:
        argtyped = types.ModuleType("argtyped")

        class Arguments:
            def __init_subclass__(cls, **kw):
                pass

        argtyped.Arguments = Arguments
        sys.modules["argtyped"] = argtyped
    import utils.dataset.common as ref_common
    return ref_common


# Multi-minute suites (cross-stack loop/config parity, multi-process
# meshes, full CLI workflows).  Auto-marked `slow` so the fast loop is
# `pytest tests/ -m "not slow"` and the full suite stays plain
# `pytest tests/`.
SLOW_FILES = {
    "test_e2e.py",               # ~6 min: full CLI workflows on fixtures
    "test_parallel.py",          # ~7 min: DP8 + DP4xTP2 on the fake mesh
    "test_distributed.py",       # 2-OS-process meshes + cross-host Orbax
    "test_flagship_parity.py",   # flagship widths vs live torch
    "test_flagship_shapes.py",   # flagship-geometry TP compiles (~80 s)
    "test_full_config_parity.py",  # literal 12/6/6 schedule, ~250M params
    "test_eval_parity.py",       # live reference test.py loop
    "test_train_loop_parity.py",    # live reference train/val epochs
    "test_pretrain_loop_parity.py",  # live reference pretrain epochs
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute cross-stack / multi-process suites")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if Path(item.fspath).name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def load_entry(name: str):
    """Load a repo-root entry script (pretrain/train/test) by file path —
    immune to the name collision with the reference's same-named modules
    once /root/reference is on sys.path."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_{name}", REPO_ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
