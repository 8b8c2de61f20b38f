"""Pure-Python reader/writer for PyTorch checkpoint files (no torch import).

TPU hosts should not need a 2 GB torch install just to read/write the
reference's ``.bin`` interop format (reference save: ``utils/utils_init.py:
277-295``; load: ``vilbert/vilbert.py:1104-1160``).  This module implements
both directions of torch's serialization protocol over numpy arrays:

  * **zip format** (torch >= 1.6 default): a ZIP archive holding
    ``<name>/data.pkl`` (a protocol-2 pickle whose tensors are persistent-id
    references to typed storages), ``<name>/data/<key>`` raw little-endian
    storage payloads, and ``<name>/version``.  The writer emits byte-exact
    protocol-2 opcodes in torch's own dialect (GLOBAL-based, ``_codecs
    encode`` for bytes), so files load in torch 1.x AND under torch >= 2.6's
    ``weights_only=True`` restricted unpickler.
  * **legacy format** (torch < 1.6, read-only): magic / protocol-version /
    sys-info pickles, the object pickle with 6-tuple storage persistent ids
    (incl. view metadata), the storage-key list, then each storage as an
    int64 count header + raw bytes.  The published ViLBERT Conceptual
    Captions ``pretrained_model.bin`` (2019-era) is in this format.

Tensors deserialize as numpy arrays (strided views are materialized
contiguous); unknown globals raise, mirroring ``weights_only`` hygiene.
"""
from __future__ import annotations

import codecs
import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict, List, Tuple

import numpy as np

try:  # bf16 checkpoints need ml_dtypes (jax dependency, always present here)
    import ml_dtypes
    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

MAGIC_NUMBER = 0x1950A86A20F9469CFC6C
PROTOCOL_VERSION = 1001

_STORAGE_TO_DTYPE = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
if _BFLOAT16 is not None:
    _STORAGE_TO_DTYPE["BFloat16Storage"] = _BFLOAT16
_DTYPE_TO_STORAGE = {v: k for k, v in _STORAGE_TO_DTYPE.items()}


# --------------------------------------------------------------------------- #
# reading
# --------------------------------------------------------------------------- #
class _StorageRef:
    """A typed flat buffer; tensors are strided views into one of these."""

    __slots__ = ("dtype", "key", "numel", "_loader", "_data")

    def __init__(self, dtype, key, numel, loader):
        self.dtype, self.key, self.numel = dtype, key, numel
        self._loader, self._data = loader, None

    def data(self) -> np.ndarray:
        if self._data is None:
            raw = self._loader(self)
            self._data = np.frombuffer(raw, dtype=self.dtype,
                                       count=self.numel)
        return self._data


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    del requires_grad, backward_hooks, metadata
    # as_strided trusts its arguments completely, so a corrupt/crafted
    # checkpoint declaring extents past the storage would silently read
    # out-of-bounds heap memory (or segfault) — bound-check the furthest
    # element the view can touch first, the same extent discipline the
    # native store readers apply
    size = tuple(int(d) for d in size)
    stride = tuple(int(s) for s in stride)
    offset = int(storage_offset)
    if (offset < 0 or len(size) != len(stride)
            or any(d < 0 for d in size) or any(s < 0 for s in stride)):
        raise ValueError(
            f"corrupt tensor metadata: offset {offset}, size {size}, "
            f"stride {stride}")
    if all(d > 0 for d in size):
        last = offset + sum(s * (d - 1) for s, d in zip(stride, size))
        if last >= storage.numel:
            raise ValueError(
                f"tensor view reaches element {last} of a "
                f"{storage.numel}-element storage — corrupt checkpoint")
    flat = storage.data()[offset:]
    itemsize = storage.dtype.itemsize
    strided = np.lib.stride_tricks.as_strided(
        flat, shape=size, strides=tuple(s * itemsize for s in stride))
    return strided.copy()  # contiguous + owns data (0-d shape preserved)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


class _TorchUnpickler(pickle.Unpickler):
    """weights_only-style restricted unpickler mapping tensors to numpy."""

    def __init__(self, file, storage_loader):
        super().__init__(file, encoding="utf-8")
        self._storage_loader = storage_loader
        self._storages: Dict[str, _StorageRef] = {}

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_tensor":
            return _rebuild_tensor
        if module == "torch" and name in _STORAGE_TO_DTYPE:
            return _STORAGE_TO_DTYPE[name]
        if module == "torch" and name == "Size":
            return tuple
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "_codecs" and name == "encode":
            return codecs.encode
        raise pickle.UnpicklingError(
            f"torch_serialization: global '{module}.{name}' is not in the "
            "tensor-checkpoint allowlist")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        if len(pid) == 5:  # zip format: (tag, dtype, key, location, numel)
            _, dtype, key, _loc, numel = pid
            view_metadata = None
        else:  # legacy: (tag, dtype, root_key, location, numel, view_meta)
            _, dtype, key, _loc, numel, view_metadata = pid
        if not isinstance(dtype, np.dtype):
            raise pickle.UnpicklingError(f"unknown storage type in {pid!r}")
        key = str(key)
        if key not in self._storages:
            self._storages[key] = _StorageRef(dtype, key, int(numel),
                                              self._storage_loader)
        root = self._storages[key]
        if view_metadata is not None:
            view_key, offset, view_size = view_metadata
            view_key = str(view_key)
            if view_key not in self._storages:
                view = _StorageRef(dtype, view_key, int(view_size),
                                   lambda _ref, r=root, o=offset,
                                   n=int(view_size):
                                   r.data()[o:o + n].tobytes())
                self._storages[view_key] = view
            return self._storages[view_key]
        return root


def _load_zip(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        pkl_name = next((n for n in zf.namelist()
                         if n.endswith("/data.pkl") or n == "data.pkl"), None)
        if pkl_name is None:
            raise ValueError(
                f"{path}: no data.pkl entry — a zip archive but not a torch "
                "zip checkpoint (accepted formats: torch zip, torch legacy, "
                "tar.gz archive containing one of those)")
        prefix = pkl_name[: -len("data.pkl")]
        byteorder_name = f"{prefix}byteorder"
        if byteorder_name in zf.namelist():
            order = zf.read(byteorder_name).decode().strip()
            if order != "little":  # TPU hosts are all little-endian
                raise ValueError(f"unsupported byte order {order!r}")

        def loader(ref: _StorageRef) -> bytes:
            return zf.read(f"{prefix}data/{ref.key}")

        up = _TorchUnpickler(io.BytesIO(zf.read(pkl_name)), loader)
        return up.load()


class _PlainUnpickler(pickle.Unpickler):
    """For the legacy header/key pickles (magic, protocol, sys-info, the
    storage-key list): primitives and containers only.  These sections run
    BEFORE the magic check can reject a non-checkpoint file, so they must
    never resolve a global or persistent id — a crafted 'checkpoint' whose
    first pickle reduces to a callable would otherwise execute on load,
    defeating the module's weights_only hygiene."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"torch_serialization: legacy header pickle references global "
            f"'{module}.{name}' — not a torch legacy checkpoint")

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "unexpected persistent id in a legacy header pickle")


def _plain_load(f) -> Any:
    return _PlainUnpickler(f, encoding="utf-8").load()


def _load_legacy(path: str) -> Any:
    with open(path, "rb") as f:
        magic = _plain_load(f)
        if magic != MAGIC_NUMBER:
            raise ValueError(f"{path}: not a torch legacy checkpoint "
                             f"(magic {magic!r})")
        protocol = _plain_load(f)
        if protocol != PROTOCOL_VERSION:
            raise ValueError(f"{path}: unsupported legacy protocol "
                             f"{protocol}")
        _sys_info = _plain_load(f)

        # Storage payloads live AFTER the object pickle, so this takes two
        # passes: pass 1 unpickles with an all-zeros storage loader purely
        # to learn each storage's dtype/element count from the persistent
        # ids; the trailing section is then read with that info; pass 2
        # re-unpickles with the real payloads.  (torch fills pre-created
        # storages in place instead; numpy views can't do that cleanly.)
        pickle_start = f.tell()
        up1 = _TorchUnpickler(
            f, lambda ref: bytes(ref.numel * ref.dtype.itemsize))
        up1.load()

        # trailing section: pickled key list, then per-key storage payloads
        # written as int64 count + raw bytes.  The count is the typed
        # element count in torch-1.x files; cross-check against the
        # persistent-id numel so either convention reads correctly.
        storages_raw: Dict[str, bytes] = {}
        keys: List[str] = _plain_load(f)
        for key in keys:
            ref = up1._storages[str(key)]
            (count,) = struct.unpack("<q", f.read(8))
            expected = ref.numel * ref.dtype.itemsize
            if count == ref.numel:
                nbytes = expected
            elif count == expected:
                nbytes = count
            else:
                raise ValueError(
                    f"{path}: storage {key} header {count} matches neither "
                    f"element count {ref.numel} nor byte size {expected}")
            storages_raw[str(key)] = f.read(nbytes)

        f.seek(pickle_start)
        up2 = _TorchUnpickler(f, lambda ref: storages_raw[ref.key])
        return up2.load()


def load(path) -> Any:
    """torch.load(path, map_location='cpu') equivalent; tensors -> numpy.

    Format sniffing reads the leading local-file-header magic like
    torch's own ``_is_zipfile`` — ``zipfile.is_zipfile`` scans the LAST
    64 KB for an end-of-central-directory signature, which raw tensor
    bytes at the end of a legacy file can spuriously contain."""
    path = os.fspath(path)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"PK\x03\x04":
        return _load_zip(path)
    return _load_legacy(path)


# --------------------------------------------------------------------------- #
# writing (zip format, torch-1.6+ / weights_only-compatible)
# --------------------------------------------------------------------------- #
class _TorchPickler:
    """Emits torch.save's exact protocol-2 pickle dialect.

    Hand-rolled because the stdlib pickler cannot reference
    ``torch.FloatStorage`` / ``torch._utils._rebuild_tensor_v2`` as globals
    unless torch is importable — the entire point here is that it need not
    be.  Storages are deduplicated by array identity, so tied weights (the
    MLM decoder / word embedding) share one payload exactly as torch does.
    """

    def __init__(self):
        self.out = io.BytesIO()
        self.storages: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._storage_keys: Dict[int, str] = {}
        # keep every array whose id() keys _storage_keys alive for the
        # pickler's lifetime, so CPython cannot recycle an id mid-dump
        self._keepalive: List[np.ndarray] = []

    # -- low-level opcode emitters ---------------------------------------- #
    def _w(self, b: bytes):
        self.out.write(b)

    def _global(self, module: str, name: str):
        self._w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def _int(self, v: int):
        if 0 <= v < 256:
            self._w(b"K" + struct.pack("<B", v))
        elif 0 <= v < 65536:
            self._w(b"M" + struct.pack("<H", v))
        elif -(2 ** 31) <= v < 2 ** 31:
            self._w(b"J" + struct.pack("<i", v))
        else:
            data = v.to_bytes((v.bit_length() + 8) // 8, "little",
                              signed=True)
            self._w(b"\x8a" + struct.pack("<B", len(data)) + data)

    def _str(self, s: str):
        raw = s.encode("utf-8")
        self._w(b"X" + struct.pack("<I", len(raw)) + raw)

    def _tuple(self, items: Tuple):
        if len(items) == 0:
            self._w(b")")
            return
        if len(items) <= 3:
            for it in items:
                self._obj(it)
            self._w((b"\x85", b"\x86", b"\x87")[len(items) - 1])
            return
        self._w(b"(")
        for it in items:
            self._obj(it)
        self._w(b"t")

    # -- torch-specific forms --------------------------------------------- #
    def _storage_key(self, arr: np.ndarray) -> str:
        # Dedup by the CALLER's array identity (before any contiguous copy):
        # tied weights passed as the same non-contiguous view object must
        # still share one storage payload, exactly as torch does.
        key = self._storage_keys.get(id(arr))
        if key is None:
            key = str(len(self.storages))
            self._storage_keys[id(arr)] = key
            self._keepalive.append(arr)
            # ascontiguousarray promotes 0-d to 1-d, so it is used for the
            # storage PAYLOAD only — tensor metadata comes from the
            # caller's array (shape () stays (), caught by the fuzz matrix)
            self.storages[key] = np.ascontiguousarray(arr)
        return key

    def _tensor(self, arr: np.ndarray):
        dtype = np.dtype(arr.dtype)
        storage_cls = _DTYPE_TO_STORAGE.get(dtype)
        if storage_cls is None:
            raise TypeError(f"no torch storage type for dtype {dtype}")
        key = self._storage_key(arr)
        self._global("torch._utils", "_rebuild_tensor_v2")
        self._w(b"(")
        # persistent id tuple + BINPERSID
        self._w(b"(")
        self._str("storage")
        self._global("torch", storage_cls)
        self._str(key)
        self._str("cpu")
        self._int(arr.size)
        self._w(b"t")
        self._w(b"Q")
        self._int(0)  # storage_offset
        self._tuple(tuple(int(d) for d in arr.shape))
        # contiguous strides in elements
        strides, acc = [], 1
        for d in reversed(arr.shape):
            strides.append(acc)
            acc *= int(d)
        self._tuple(tuple(reversed(strides)))
        self._w(b"\x89")  # requires_grad = False
        self._global("collections", "OrderedDict")
        self._w(b")R")  # backward_hooks = OrderedDict()
        self._w(b"t")
        self._w(b"R")

    def _bytes(self, b: bytes):
        # torch/pickle protocol-2 idiom: _codecs.encode(latin1_str, 'latin1')
        self._global("_codecs", "encode")
        self._str(b.decode("latin1"))
        self._str("latin1")
        self._w(b"\x86R")

    def _obj(self, obj: Any):
        if obj is None:
            self._w(b"N")
        elif obj is True:
            self._w(b"\x88")
        elif obj is False:
            self._w(b"\x89")
        elif isinstance(obj, (int, np.integer)):
            self._int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self._w(b"G" + struct.pack(">d", float(obj)))
        elif isinstance(obj, str):
            self._str(obj)
        elif isinstance(obj, (bytes, bytearray)):
            self._bytes(bytes(obj))
        elif isinstance(obj, np.ndarray):
            self._tensor(obj)
        elif isinstance(obj, dict):
            self._w(b"}")
            if obj:
                self._w(b"(")
                for k, v in obj.items():
                    self._obj(k)
                    self._obj(v)
                self._w(b"u")
        elif isinstance(obj, tuple):
            self._tuple(obj)
        elif isinstance(obj, list):
            self._w(b"]")
            if obj:
                self._w(b"(")
                for it in obj:
                    self._obj(it)
                self._w(b"e")
        else:
            raise TypeError(
                f"torch_serialization cannot serialize {type(obj)!r}")

    def dumps(self, obj: Any) -> bytes:
        self._w(b"\x80\x02")  # PROTO 2 (torch's default)
        self._obj(obj)
        self._w(b".")
        return self.out.getvalue()


def save(obj: Any, path) -> None:
    """torch.save equivalent producing the zip format; numpy -> tensors.

    The archive internal name is the file stem (torch's convention); entries
    are stored uncompressed so torch's mmap-based reader can use them."""
    path = os.fspath(path)
    pickler = _TorchPickler()
    data_pkl = pickler.dumps(obj)
    name = os.path.splitext(os.path.basename(path))[0] or "archive"
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{name}/data.pkl", data_pkl)
        zf.writestr(f"{name}/byteorder", "little")
        for key, arr in pickler.storages.items():
            zf.writestr(f"{name}/data/{key}", arr.tobytes())
        zf.writestr(f"{name}/version", "3\n")
