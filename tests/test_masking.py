"""Tests for the MLM/MVM masking threshold ladder (ops/masking.py).

Golden behavior is pinned by injecting a deterministic uniform field through
a fake Generator, mirroring reference common.py:213-300 semantics exactly.
"""
import numpy as np

from youtube_vln_tpu.ops import masking as M


class FakeRng:
    """np.random.Generator stand-in with scripted uniform/int draws."""

    def __init__(self, p, randints=None):
        self._p = p
        self._randints = randints

    def random(self, shape):
        assert shape == self._p.shape
        return self._p

    def integers(self, lo, hi, size=None, dtype=np.int64):
        if self._randints is not None:
            return self._randints.astype(dtype)
        return np.full(size, lo, dtype=dtype)


def test_token_ladder_golden():
    tokens = np.array([[10, 11, 12, 13, 14, 0]])
    mask = np.array([[1, 1, 1, 1, 1, 0]])
    #       keep    mask    random  keep-10%  below   padded(high p but mask=0)
    p = np.array([[0.10, 0.90, 0.975, 0.99, 0.84, 0.0]])
    rnd = np.full((1, 6), 77)
    out, targets = M.randomize_tokens_np(
        tokens, mask, vocab_size=100, mask_token_id=103,
        rng=FakeRng(p, rnd))
    # col0: untouched; col1: [MASK]; col2: random token; col3: kept original
    np.testing.assert_array_equal(out, [[10, 103, 77, 13, 14, 0]])
    np.testing.assert_array_equal(targets, [[-1, 11, 12, 13, -1, -1]])


def test_region_ladder_golden():
    feats = np.ones((1, 4, 3), np.float32)
    probs = np.full((1, 4, 5), 0.9, np.float32)
    mask = np.array([[1, 1, 1, 0]])
    #          target-only   zeroed     untouched  padded
    p = np.array([[0.855, 0.87, 0.3, 0.0]])
    out, targets, tmask = M.randomize_regions_np(feats, probs, mask,
                                                 FakeRng(p))
    np.testing.assert_array_equal(tmask, [[1, 1, 0, 0]])
    # region 0 masked but NOT zeroed (0.855 < 0.865)
    np.testing.assert_array_equal(out[0, 0], np.ones(3))
    np.testing.assert_array_equal(out[0, 1], np.zeros(3))
    np.testing.assert_array_equal(targets[0, 0], probs[0, 0])
    np.testing.assert_allclose(targets[0, 2], np.full(5, 0.2))


def test_token_masking_statistics(rng):
    tokens = rng.integers(5, 1000, size=(200, 60))
    mask = np.ones_like(tokens)
    out, targets = M.randomize_tokens_np(
        tokens, mask, vocab_size=1000, mask_token_id=103,
        rng=np.random.default_rng(0))
    frac_masked = np.mean(targets >= 0)
    assert 0.13 < frac_masked < 0.17          # 15% scheme
    sel = targets >= 0
    frac_mask_token = np.mean(out[sel] == 103)
    assert 0.75 < frac_mask_token < 0.85      # ~80% -> [MASK]
    frac_kept = np.mean(out[sel] == targets[sel])
    assert 0.06 < frac_kept < 0.14            # ~10% kept (+ rare rand==orig)


def test_action_masking():
    tokens = np.full((4, 10), 500)
    tokens[:, 3] = 2187  # 'left'
    tokens[:, 7] = 2830  # 'forward'
    mask = np.ones_like(tokens)
    out, targets = M.randomize_tokens_np(
        tokens, mask, vocab_size=1000, mask_token_id=103,
        rng=np.random.default_rng(1), mask_action_rate=1.0)
    action_cols = np.isin(targets, (2187, 2830))
    assert action_cols.sum() >= 4  # with replacement, >= half typically hit
    assert np.all(np.isin(out[action_cols], (103,)) | np.isin(
        out[action_cols], (2187, 2830)))  # masked or kept by the 10% band


def test_jax_variants_match_semantics(rng):
    import jax
    tokens = rng.integers(5, 200, size=(8, 16))
    mask = np.ones_like(tokens)
    out, targets = M.randomize_tokens_jax(
        jax.random.PRNGKey(0), tokens, mask, 200, 103)
    out, targets = np.asarray(out), np.asarray(targets)
    sel = targets >= 0
    np.testing.assert_array_equal(targets[sel >= 1], targets[sel])
    # unmasked positions unchanged
    np.testing.assert_array_equal(out[~sel], tokens[~sel])

    feats = rng.normal(size=(4, 10, 6)).astype(np.float32)
    probs = rng.random((4, 10, 5)).astype(np.float32)
    f2, t2, m2 = M.randomize_regions_jax(jax.random.PRNGKey(1), feats, probs,
                                         np.ones((4, 10)))
    f2, t2, m2 = map(np.asarray, (f2, t2, m2))
    np.testing.assert_array_equal(f2[m2 == 0], feats[m2 == 0])
    np.testing.assert_allclose(t2[m2 == 0], 1 / 5, atol=1e-6)
    np.testing.assert_array_equal(t2[m2 == 1], probs[m2 == 1])


def test_masking_same_draws_matches_live_reference():
    """Run the ACTUAL reference randomize_tokens/randomize_regions (torch)
    and ours on the SAME uniform/randint draws (captured by replaying
    torch's rng calls in the reference's order) — outputs must be
    identical.  The golden tests above pin the formula; this pins that the
    formula matches the live reference code, not a shared misreading.
    mask_action_rate stays 0 (the published recipes' value): the action
    branch enumerates positions grouped by action token while we use
    row-major order — distribution-equal (uniform over the same position
    set, pinned by test_action_masking) but not draw-identical."""
    import torch
    from types import SimpleNamespace
    from conftest import import_reference_common

    ref = import_reference_common()
    rng = np.random.default_rng(5)

    vocab = {f"t{i}": i for i in range(120)}
    vocab["[MASK]"] = 103
    tok_stub = SimpleNamespace(vocab=vocab)
    args_stub = SimpleNamespace(mask_action_rate=0.0)

    tokens = rng.integers(5, 100, size=(6, 16))
    mask = (rng.random((6, 16)) < 0.9).astype(np.int64)

    torch.manual_seed(11)
    ref_out, ref_tgt = ref.randomize_tokens(
        torch.from_numpy(tokens.copy()), torch.from_numpy(mask),
        tok_stub, args_stub)

    # replay torch's draws in the reference's call order
    torch.manual_seed(11)
    u = torch.rand_like(torch.from_numpy(tokens).float()).numpy()
    randints = torch.randint_like(torch.from_numpy(tokens),
                                  len(vocab)).numpy()
    out, tgt = M.randomize_tokens_np(tokens, mask, len(vocab), 103,
                                     FakeRng(u, randints))
    np.testing.assert_array_equal(out, ref_out.numpy())
    np.testing.assert_array_equal(tgt, ref_tgt.numpy())

    # regions
    feats = rng.normal(size=(4, 9, 7)).astype(np.float32)
    probs = rng.random((4, 9, 5)).astype(np.float32)
    rmask = (rng.random((4, 9)) < 0.9).astype(np.int64)

    torch.manual_seed(12)
    rf, rt, rm = ref.randomize_regions(
        torch.from_numpy(feats.copy()), torch.from_numpy(probs),
        torch.from_numpy(rmask))
    torch.manual_seed(12)
    u2 = torch.rand_like(torch.from_numpy(rmask).float()).numpy()
    of, ot, om = M.randomize_regions_np(feats, probs, rmask, FakeRng(u2))
    np.testing.assert_array_equal(of, rf.numpy())
    np.testing.assert_array_equal(ot, rt.numpy())
    np.testing.assert_array_equal(om, rm.numpy())
