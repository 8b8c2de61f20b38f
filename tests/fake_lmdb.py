"""Minimal in-process ``lmdb`` stand-in for cross-stack parity tests.

The real lmdb C library is not installed in this image.  The reference
``FeaturesReader`` (reference ``utils/dataset/features_reader.py:16-66``)
only calls ``lmdb.open(...)``, ``env.begin(...)`` and ``txn.get(bytes)``,
so a pickle-backed dict is a faithful replacement.

``store_to_lmdb_pickle`` exports one of our ``.vlnstore`` files into that
format using the reference's "new" record schema — base64-encoded raw
float32 buffers (reference ``features_reader.py:196-233``) — so the
reference readers decode byte-identical arrays to what our own readers
return.
"""
from __future__ import annotations

import base64
import builtins
import pickle
import sys
import types


class _Txn:
    def __init__(self, data):
        self._data = data

    def get(self, key):
        return self._data.get(bytes(key))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Env:
    def __init__(self, data):
        self._data = data

    def begin(self, write=False, buffers=False):
        assert not write, "fake lmdb is read-only"
        return _Txn(self._data)

    def close(self):
        pass


def _open(path, **kwargs):
    with builtins.open(str(path), "rb") as f:
        return _Env(pickle.load(f))


def install():
    """Register the fake module under ``sys.modules['lmdb']`` (idempotent)."""
    if "lmdb" in sys.modules:
        return sys.modules["lmdb"]
    mod = types.ModuleType("lmdb")
    mod.open = _open
    sys.modules["lmdb"] = mod
    return mod


def store_to_lmdb_pickle(store_path, out_path, pano: bool = True):
    """Export a .vlnstore into the pickle-dict format ``_open`` loads."""
    import numpy as np

    from youtube_vln_tpu.data.store import Store

    def b64(a):
        return base64.b64encode(
            np.ascontiguousarray(a, np.float32).tobytes())

    store = Store(store_path)
    data = {}
    keys = []
    for key in store.keys:
        rec = store.get(key)
        item = {
            "image_w": rec.image_w,
            "image_h": rec.image_h,
            "vfov": 60,
            # "new"-convention field names (features_reader.py:124-150)
            "features": b64(rec.features),
            "boxes": b64(rec.boxes),
            "cls_prob": b64(rec.cls_prob),
        }
        if pano:
            scan, vp = key.split("-")
            item.update({
                "scanId": scan,
                "viewpointId": vp,
                "viewHeading": b64(rec.view_heading),
                "viewElevation": b64(rec.view_elevation),
                "featureHeading": b64(rec.feat_heading),
                "featureElevation": b64(rec.feat_elevation),
                "featureViewIndex": b64(rec.feat_view_index),
            })
        data[key.encode()] = pickle.dumps(item)
        keys.append(key.encode())
    data[b"keys"] = pickle.dumps(keys)
    with builtins.open(str(out_path), "wb") as f:
        pickle.dump(data, f)
    store.close()
    return str(out_path)
