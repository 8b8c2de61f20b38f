"""Fuzz matrix for models/torch_serialization.py vs real torch.

Every checkpoint in this framework rides the hand-rolled pickler/unpickler
(VERDICT r3 #7): a silent dtype or topology bug would corrupt params with
no error.  This file round-trips a dtype x topology matrix in BOTH
directions against torch.save / torch.load:

  * dtypes: f32 f64 f16 bf16 i64 i32 i16 i8 u8 bool
  * topologies: 0-d, empty, 1-d .. 4-d, nested dict/list/tuple,
    empty containers, scalars/str/bytes/None/bool leaves
  * storage sharing: tied weights (same object twice, incl. a
    NON-contiguous view — ADVICE r3 #4), torch-side shared storages,
    torch-side strided/offset views (transpose, slice, narrow)
  * formats: zip (both directions) + legacy (read direction)
"""
import numpy as np
import pytest

from youtube_vln_tpu.models import torch_serialization as tser

torch = pytest.importorskip("torch")
ml_dtypes = pytest.importorskip("ml_dtypes")

BF16 = np.dtype(ml_dtypes.bfloat16)

# (numpy dtype, torch dtype) rows of the matrix
DTYPES = [
    (np.dtype(np.float32), torch.float32),
    (np.dtype(np.float64), torch.float64),
    (np.dtype(np.float16), torch.float16),
    (BF16, torch.bfloat16),
    (np.dtype(np.int64), torch.int64),
    (np.dtype(np.int32), torch.int32),
    (np.dtype(np.int16), torch.int16),
    (np.dtype(np.int8), torch.int8),
    (np.dtype(np.uint8), torch.uint8),
    (np.dtype(np.bool_), torch.bool),
]

SHAPES = [(), (0,), (0, 3), (7,), (3, 5), (2, 3, 4), (2, 1, 3, 2)]


def _np_array(rng, dtype, shape):
    if dtype == np.bool_:
        return rng.integers(0, 2, size=shape).astype(np.bool_)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return rng.integers(max(info.min, -1000), min(info.max, 1000) + 1,
                            size=shape).astype(dtype)
    # float-ish (incl. bf16): draw f32 then cast, so the bytes are
    # exactly representable in the target dtype after the cast
    return rng.normal(size=shape).astype(np.float32).astype(dtype)


def _as_f64(a):
    """Comparison domain that covers bf16 and bool uniformly."""
    return np.asarray(a).astype(np.float64)


def _assert_tensor_equal(got_np, exp, msg=""):
    exp_np = exp.detach().numpy() if isinstance(exp, torch.Tensor) else exp
    assert tuple(np.shape(got_np)) == tuple(np.shape(exp_np)), msg
    np.testing.assert_array_equal(_as_f64(got_np), _as_f64(exp_np),
                                  err_msg=msg)


def _to_torch(a):
    a = np.ascontiguousarray(a).reshape(a.shape)  # keep 0-d as 0-d
    if a.dtype == BF16:
        return torch.from_numpy(a.astype(np.float32)).to(torch.bfloat16)
    return torch.from_numpy(a)


@pytest.mark.parametrize("np_dtype,torch_dtype", DTYPES,
                         ids=[str(d[0]) for d in DTYPES])
def test_dtype_shape_matrix_ours_to_torch(tmp_path, np_dtype, torch_dtype):
    rng = np.random.default_rng(hash(str(np_dtype)) % 2 ** 31)
    tree = {f"s{i}": _np_array(rng, np_dtype, s)
            for i, s in enumerate(SHAPES)}
    path = tmp_path / "ours.bin"
    tser.save(tree, path)
    loaded = torch.load(path, weights_only=True)
    assert set(loaded) == set(tree)
    for k, exp in tree.items():
        got = loaded[k]
        assert got.dtype == torch_dtype, k
        _assert_tensor_equal(got.to(torch.float64).numpy()
                             if got.dtype == torch.bfloat16 else got.numpy(),
                             exp, k)


@pytest.mark.parametrize("np_dtype,torch_dtype", DTYPES,
                         ids=[str(d[0]) for d in DTYPES])
@pytest.mark.parametrize("legacy", [False, True], ids=["zip", "legacy"])
def test_dtype_shape_matrix_torch_to_ours(tmp_path, np_dtype, torch_dtype,
                                          legacy):
    rng = np.random.default_rng(hash(str(np_dtype)) % 2 ** 31 + 1)
    arrays = {f"s{i}": _np_array(rng, np_dtype, s)
              for i, s in enumerate(SHAPES)}
    tree = {k: _to_torch(v) for k, v in arrays.items()}
    path = tmp_path / "theirs.bin"
    torch.save(tree, path, _use_new_zipfile_serialization=not legacy)
    loaded = tser.load(path)
    assert set(loaded) == set(arrays)
    for k, exp in arrays.items():
        got = loaded[k]
        assert np.dtype(got.dtype) == np_dtype, k
        _assert_tensor_equal(got, exp, k)


def test_nested_containers_both_directions(tmp_path):
    rng = np.random.default_rng(7)
    a = rng.normal(size=(3, 4)).astype(np.float32)
    obj = {
        "model": {"w": a, "b": rng.normal(size=4).astype(np.float32)},
        "meta": {"epoch": 12, "lr": 1e-4, "name": "lily",
                 "blob": b"\x00\xffraw", "flag": True, "none": None},
        "history": [1, 2.5, "three", (a[0], [a[1]])],
        "empty_dict": {}, "empty_list": [], "empty_tuple": (),
        "big_int": 2 ** 40, "neg": -17,
    }
    path = tmp_path / "nested_ours.bin"
    tser.save(obj, path)
    t = torch.load(path, weights_only=True)
    assert t["meta"]["epoch"] == 12 and t["meta"]["lr"] == 1e-4
    assert t["meta"]["name"] == "lily" and t["meta"]["blob"] == b"\x00\xffraw"
    assert t["meta"]["flag"] is True and t["meta"]["none"] is None
    assert t["empty_dict"] == {} and t["empty_list"] == []
    assert t["empty_tuple"] == ()
    assert t["big_int"] == 2 ** 40 and t["neg"] == -17
    assert isinstance(t["history"][3], tuple)
    _assert_tensor_equal(t["model"]["w"].numpy(), a)
    _assert_tensor_equal(t["history"][3][1][0].numpy(), a[1])

    # reverse: torch writes an equivalent nest, we read it
    tobj = {
        "model": {"w": _to_torch(a)},
        "meta": {"epoch": 12, "blob": b"\x01\x02", "none": None},
        "history": [1, (torch.from_numpy(a[0].copy()),)],
        "empty": {},
    }
    tpath = tmp_path / "nested_theirs.bin"
    torch.save(tobj, tpath)
    ours = tser.load(tpath)
    assert ours["meta"]["epoch"] == 12 and ours["meta"]["blob"] == b"\x01\x02"
    assert ours["meta"]["none"] is None and ours["empty"] == {}
    assert isinstance(ours["history"][1], tuple)
    _assert_tensor_equal(ours["model"]["w"], a)
    _assert_tensor_equal(ours["history"][1][0], a[0])


def test_tied_weights_share_storage_contiguous_and_views(tmp_path):
    """ADVICE r3 #4: a tied weight passed as the SAME non-contiguous view
    object twice must serialize one storage, not per-occurrence copies."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 6)).astype(np.float32)
    view = base.T  # non-contiguous
    assert not view.flags.c_contiguous
    obj = {"contig_a": base, "contig_b": base,
           "view_a": view, "view_b": view}
    path = tmp_path / "tied.bin"
    tser.save(obj, path)

    # storage count on disk: exactly 2 payloads (base + one view copy)
    import zipfile
    with zipfile.ZipFile(path) as zf:
        payloads = [n for n in zf.namelist() if "/data/" in n]
    assert len(payloads) == 2

    t = torch.load(path, weights_only=True)
    assert t["contig_a"].data_ptr() == t["contig_b"].data_ptr()
    assert t["view_a"].data_ptr() == t["view_b"].data_ptr()
    _assert_tensor_equal(t["view_a"].numpy(), base.T)


def test_torch_side_strided_views_and_shared_storage(tmp_path):
    """torch.save preserves strides/offsets; our reader must materialize
    the view contents correctly (transpose, slice, narrow, offset)."""
    rng = np.random.default_rng(13)
    full = torch.from_numpy(rng.normal(size=(6, 8)).astype(np.float32))
    obj = {
        "full": full,
        "t": full.t(),                 # stride-swapped
        "row_slice": full[2:5],        # storage offset
        "col_slice": full[:, 1:7:2],   # non-unit stride
        "narrow": full.narrow(0, 1, 3).narrow(1, 2, 4),
        "scalar_view": full[3, 4],     # 0-d view with offset
    }
    for legacy in (False, True):
        path = tmp_path / f"views_{legacy}.bin"
        torch.save(obj, path, _use_new_zipfile_serialization=not legacy)
        ours = tser.load(path)
        for k, exp in obj.items():
            _assert_tensor_equal(ours[k], exp.contiguous(),
                                 f"{k} legacy={legacy}")


def test_full_roundtrip_ours_to_torch_to_ours(tmp_path):
    """ours.save -> torch.load -> torch.save -> ours.load is the identity
    for a mixed-dtype state dict."""
    rng = np.random.default_rng(17)
    tree = {str(d[0]): _np_array(rng, d[0], (2, 3)) for d in DTYPES}
    p1, p2 = tmp_path / "a.bin", tmp_path / "b.bin"
    tser.save(tree, p1)
    torch.save(torch.load(p1, weights_only=True), p2)
    back = tser.load(p2)
    for k, exp in tree.items():
        assert np.dtype(back[k].dtype) == np.dtype(exp.dtype), k
        _assert_tensor_equal(back[k], exp, k)


def test_zip_without_data_pkl_raises_clear_error(tmp_path):
    """ADVICE r3 #3: a non-torch zip must raise ValueError naming the
    path, not a bare StopIteration."""
    import zipfile
    path = tmp_path / "not_torch.zip"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("something/else.txt", "hi")
    with pytest.raises(ValueError, match="data.pkl"):
        tser.load(path)


def test_unrecognized_checkpoint_path_raises_clear_error(tmp_path):
    """ADVICE r3 #2: a junk path must not die with an opaque tarfile
    ReadError inside resolve_pretrained."""
    from youtube_vln_tpu.training import checkpoint as ckpt
    bad = tmp_path / "model.cabin"
    bad.write_bytes(b"this is not a checkpoint of any kind")
    with pytest.raises(ValueError, match="not a recognized checkpoint"):
        ckpt.resolve_pretrained(str(bad))
