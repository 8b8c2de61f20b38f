"""Benchmark measurement helpers (scripts/bench_serving.py).

axon memoizes identical-input dispatches and returns fake ~0.3 ms
timings (CLAUDE.md gotcha), so every timed dispatch must carry
bitwise-distinct input bits.  Round-5 review found the original
scalar-uniform jitter quantized to TWO factors in f16 (including
exactly 1.0 — a bitwise no-op); these tests pin the replacement's
distinctness guarantee so the benches stay honest.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from bench_serving import make_jitter, time_dispatch_windows  # noqa: E402


@pytest.mark.parametrize("dtype_name", ["float16", "float32"])
def test_make_jitter_dispatches_bitwise_distinct(dtype_name):
    import jax.numpy as jnp
    dtype = getattr(jnp, dtype_name)
    jitter = make_jitter("x", dtype)
    base = {"x": jnp.asarray(
        np.random.default_rng(0).normal(size=(257,)), dtype)}
    seen = {np.asarray(base["x"]).tobytes()}   # the unjittered batch
    for i in range(48):
        seen.add(np.asarray(jitter(base, np.int32(i))["x"]).tobytes())
    # 48 dispatches + warmup index + baseline: all distinct
    seen.add(np.asarray(jitter(base, np.int32(100_000))["x"]).tobytes())
    assert len(seen) == 50


def test_make_jitter_perturbation_negligible():
    """The factor must stay a timing-irrelevant perturbation, not a
    rescale: <= ~5% over a 36-dispatch window in f16, <<1e-4 in f32."""
    import jax.numpy as jnp
    for dtype, bound in ((jnp.float16, 0.05), (jnp.float32, 1e-4)):
        jitter = make_jitter("x", dtype)
        x = jnp.ones((4,), dtype)
        got = np.asarray(jitter({"x": x}, np.int32(35))["x"], np.float64)
        assert np.all(np.abs(got - 1.0) < bound), (dtype, got)


def test_time_dispatch_windows_counts_and_readbacks():
    import jax
    import jax.numpy as jnp
    calls = []
    fn = jax.jit(lambda p, b: b["x"].sum())

    def counting_fn(p, b):
        calls.append(np.asarray(b["x"]).tobytes())
        return fn(p, b)

    dts = time_dispatch_windows(
        counting_fn, None, {"x": jnp.ones((8,), jnp.float32)},
        make_jitter("x", jnp.float32), n_disp=4, n_windows=3)
    assert len(dts) == 3 and all(d > 0 for d in dts)
    # warmup + 3 windows x 4 dispatches, every input distinct
    assert len(calls) == 13
    assert len(set(calls)) == 13
