"""Sampler parity vs the ACTUAL reference generators (common.py).

Both sides draw from MT19937 — the reference uses the global ``random``
module, ours takes a ``random.Random`` — and the positive-path generators
make identical rng calls in identical order, so with equal seeds the
outputs must be IDENTICAL, not merely same-shaped (exact-sequence parity:
reference common.py:363-857 vs youtube_vln_tpu/data/sampling.py).

Negative generation is compared STATISTICALLY instead: the reference's
``random_fill`` shuffles the caller's fillers list IN PLACE, so successive
negatives draw from the previously-shuffled order (common.py:363-372,
435-464); we pass a fresh copy per negative.  A uniform shuffle is
memoryless, so the distributions are identical while the exact sequences
differ — pinned here by per-position chi-square homogeneity over a fixed
seed set (deterministic, no flake).
"""
import random

import numpy as np
import pytest

from conftest import import_reference_common

from youtube_vln_tpu.data import sampling as S


@pytest.fixture(scope="module")
def ref():
    return import_reference_common()


# --------------------------------------------------------------------------- #
# fixtures
# --------------------------------------------------------------------------- #
def ytb_frames(n_frames=14, captioned_every=3):
    """One video's frame dicts; every third frame is captioned, one merged
    group to exercise the merge_frames tuple path."""
    frames = []
    for i in range(n_frames):
        f = {"frame_id": i,
             "caption": f"room {i}" if i % captioned_every == 0 else ""}
        frames.append(f)
    frames[6]["merging"] = [6, 7]   # merged pair (both map to the 6-group)
    frames[7]["merging"] = [6, 7]
    frames[7]["caption"] = ""
    return {"vid": frames}


def ytb_key_traj(frames_by_video):
    ids = []
    for f in frames_by_video["vid"]:
        if f["caption"] != "":
            first = (f["merging"][0] if "merging" in f
                     and len(f["merging"]) > 1 else f["frame_id"])
            if first not in ids:
                ids.append(first)
    return sorted(ids)


def bnb_world(n_listings=4, photos_per=8):
    photos_by_listing = {}
    captions = {}
    pid = 0
    for lid in range(n_listings):
        photos_by_listing[lid] = list(range(pid, pid + photos_per))
        for j in range(photos_per):
            # alternate captioned (token sum >= 204) / captionless
            tok = [500] if (pid % 2 == 0) else [3]
            captions[pid] = {"instruction_tokens": [tok]}
            pid += 1
    return list(photos_by_listing), photos_by_listing, captions


# --------------------------------------------------------------------------- #
# exact-sequence parity
# --------------------------------------------------------------------------- #
def test_shufflers_exact_parity(ref):
    # nonadj needs n >= 4: at n=3 the middle position has NO non-adjacent
    # partner and BOTH implementations raise IndexError mid-iteration if
    # it is drawn (reference common.py:601 chooses from an empty list;
    # real callers only ever take num_negatives yields)
    for n, names in ((3, ("different", "two")),
                     (4, ("different", "two", "nonadj")),
                     (5, ("different", "two", "nonadj"))):
        seq = list(range(n))
        for name in names:
            for seed in range(5):
                random.seed(seed)
                ref_out = [list(x) for x in ref.load_shuffler(name)(seq)]
                ours = [list(x)
                        for x in S.load_shuffler(name)(seq,
                                                       random.Random(seed))]
                assert ref_out == ours, (name, n, seed)


def test_random_fill_exact_parity(ref):
    for seed in range(10):
        random.seed(seed)
        seq_r = ["a", "c"]
        fillers_r = ["x", "y", "z"]
        order_r = ref.random_fill([0, 2], [1, 3, 4], seq_r, fillers_r)

        rng = random.Random(seed)
        seq_o = ["a", "c"]
        order_o = S.random_fill([0, 2], [1, 3, 4], seq_o, ["x", "y", "z"],
                                rng)
        assert order_r == order_o and seq_r == seq_o, seed


def test_ytb_trajectory_exact_parity(ref):
    frames = ytb_frames()
    key_traj = ytb_key_traj(frames)
    for seed in range(60):
        random.seed(seed)
        ref_traj, ref_states = ref.ytb_generate_trajectory_from_listing(
            "vid", ["vid"], frames, {}, key_traj)
        traj, states = S.ytb_trajectory("vid", frames, key_traj,
                                        rng=random.Random(seed))
        assert [tuple(t) for t in map(tuple, ref_traj)] == \
               [tuple(t) for t in map(tuple, traj)], seed
        assert list(ref_states) == list(states), seed

    # the short-span top-up branch: key frames packed at the start
    tight = {"vid": [{"frame_id": i,
                      "caption": "c" if i < 2 else ""}
                     for i in range(9)]}
    for seed in range(30):
        random.seed(seed)
        ref_traj, ref_states = ref.ytb_generate_trajectory_from_listing(
            "vid", ["vid"], tight, {}, [0, 1])
        traj, states = S.ytb_trajectory("vid", tight, [0, 1],
                                        rng=random.Random(seed))
        assert [tuple(t) for t in map(tuple, ref_traj)] == \
               [tuple(t) for t in map(tuple, traj)], seed
        assert list(ref_states) == list(states), seed


def test_bnb_trajectories_exact_parity(ref):
    listing_ids, photos_by_listing, captions = bnb_world()
    for seed in range(60):
        random.seed(seed)
        ref_traj, ref_states = ref.generate_trajectory_from_listing(
            0, listing_ids, photos_by_listing, captions)
        traj, states = S.bnb_trajectory_in_listing(
            0, photos_by_listing, captions, rng=random.Random(seed))
        assert list(map(tuple, ref_traj)) == list(map(tuple, traj)), seed
        assert list(ref_states) == list(states), seed

        random.seed(1000 + seed)
        ref_traj, ref_states = ref.generate_trajectory_out_listing(
            0, listing_ids, photos_by_listing, captions)
        traj, states = S.bnb_trajectory_out_listing(
            0, listing_ids, photos_by_listing, captions,
            rng=random.Random(1000 + seed))
        assert list(map(tuple, ref_traj)) == list(map(tuple, traj)), seed
        assert list(ref_states) == list(states), seed


# --------------------------------------------------------------------------- #
# lazy shuffle_different: distributional claim
# --------------------------------------------------------------------------- #
def test_shuffle_different_lazy_first_draw_distribution():
    """For n > 6 we draw Fisher-Yates permutations lazily instead of
    materializing n! (sampling.py:34-63).  The first yield must be uniform
    over the 5039 non-identity permutations of n=7 — pinned by chi-square
    of the image-of-0 statistic against its EXACT enumerated law."""
    import itertools
    n, draws = 7, 20000
    seq = list(range(n))
    # exact law of p(0) over non-identity permutations
    counts_exact = np.zeros(n)
    for p in itertools.permutations(range(n)):
        if p != tuple(range(n)):
            counts_exact[p[0]] += 1
    probs = counts_exact / counts_exact.sum()

    rng = random.Random(123)
    observed = np.zeros(n)
    for _ in range(draws):
        first = next(S.shuffle_different(seq, rng))
        observed[first[0]] += 1
    expected = probs * draws
    chi2 = float(((observed - expected) ** 2 / expected).sum())
    # df=6; crit(alpha=1e-6) ~= 39.5.  Deterministic seed, no flake.
    assert chi2 < 39.5, (chi2, observed.tolist())


# --------------------------------------------------------------------------- #
# negatives: statistical homogeneity vs the reference
# --------------------------------------------------------------------------- #
def _collect_negative_histograms(fn, seeds, n_frame_ids):
    """Per-position frame-id histograms over neg_captions[0] and
    neg_randoms[0] (first-element histograms capture any positional or
    replacement bias)."""
    cap_hist = np.zeros((8, n_frame_ids))
    rnd_hist = np.zeros((8, n_frame_ids))
    for seed in seeds:
        neg_captions, _, neg_randoms, _ = fn(seed)
        for pos, (_, fid) in enumerate(neg_captions[0]):
            cap_hist[pos][fid[0] if isinstance(fid, (tuple, list))
                          else fid] += 1
        for pos, (_, fid) in enumerate(neg_randoms[0]):
            rnd_hist[pos][fid[0] if isinstance(fid, (tuple, list))
                          else fid] += 1
    return cap_hist, rnd_hist


def _chi2_homogeneity(h1, h2):
    """Sum of per-position two-sample chi-square statistics (only cells
    with combined support)."""
    stat, df = 0.0, 0
    for r1, r2 in zip(h1, h2):
        tot = r1 + r2
        live = tot > 0
        if live.sum() < 2 or r1.sum() == 0 or r2.sum() == 0:
            continue
        e1 = tot[live] * r1.sum() / tot.sum()
        e2 = tot[live] * r2.sum() / tot.sum()
        stat += float(((r1[live] - e1) ** 2 / np.maximum(e1, 1e-9)).sum()
                      + ((r2[live] - e2) ** 2 / np.maximum(e2, 1e-9)).sum())
        df += int(live.sum()) - 1
    return stat, df


@pytest.mark.parametrize("traj_judge", [False, True])
def test_negative_generation_statistical_parity(ref, traj_judge):
    """generate_negatives vs the reference generator, 'normal' style, ytb.
    Exact-sequence parity is impossible here by design (the reference's
    random_fill mutates its fillers in place across negatives; we pass a
    copy — memoryless-shuffle equivalent), so pin distribution equality:
    chi-square homogeneity of per-position frame-id histograms."""
    frames = ytb_frames()
    key_traj = ytb_key_traj(frames)
    video_ids = ["vid"]

    random.seed(7)
    positive, states = ref.ytb_generate_trajectory_from_listing(
        "vid", video_ids, frames, {}, key_traj)
    positive = [tuple(p) for p in positive]

    def run_ref(seed):
        random.seed(seed)
        return ref.generate_negative_trajectories(
            [tuple(p) for p in positive], list(states), video_ids, frames,
            {}, 2, ref.shuffle_different, "ytb", traj_judge, "normal")

    def run_ours(seed):
        return S.generate_negatives(
            [tuple(p) for p in positive], list(states), video_ids, frames,
            {}, 2, S.shuffle_different, "ytb", traj_judge, "normal",
            rng=random.Random(seed))

    seeds = range(400)
    n_ids = 16
    ref_cap, ref_rnd = _collect_negative_histograms(run_ref, seeds, n_ids)
    our_cap, our_rnd = _collect_negative_histograms(run_ours, seeds, n_ids)

    for h_ref, h_ours, name in ((ref_cap, our_cap, "captions"),
                                (ref_rnd, our_rnd, "randoms")):
        stat, df = _chi2_homogeneity(h_ref, h_ours)
        assert df > 0, name
        # generous: crit(alpha=1e-6) for df<=120 is < 220; a real
        # distributional divergence (e.g. a positional bias) lands in the
        # thousands.  Fixed seeds -> deterministic.
        assert stat < max(3.0 * df, 220.0), (name, stat, df)


# --------------------------------------------------------------------------- #
# template machinery (the online instruction-synthesis hot path)
# --------------------------------------------------------------------------- #
TEMPLATES = [
    {"instructions": ["walk past the [MASK] and turn [OMASK] at the [MASK] "
                      ", then stop ."]},
    {"instructions": ["go to the [MASK] . turn [OMASK] . walk into the "
                      "[MASK] . head [OMASK] and wait ."]},
    {"instructions": ["Turn [OMASK] by the [MASK] , continue to the [MASK] "
                      "and Turn [OMASK] again ."]},
    {"instructions": ["find the [MASK] then go [OMASK] toward the [MASK] "
                      "past the [MASK] ."]},
]


def test_template_indexing_exact_parity(ref):
    """index_templates vs reference sort_skeletons: identical signature
    grouping (common.py:652-673)."""
    from youtube_vln_tpu.data.instructions import index_templates
    ref_idx, ref_sig = ref.sort_skeletons(TEMPLATES)
    our_idx, our_sig = index_templates(TEMPLATES)
    assert ref_sig == our_sig
    assert list(ref_idx)[: len(our_sig)] == list(our_idx)[: len(our_sig)]


def test_fill_template_exact_parity(ref):
    """fill_template vs the reference run_insertion
    (gen_instructions4train.py:37-139): identical rng call order in the
    [MASK]-bearing branch — the only reachable one (YTb trajectories
    always carry >=2 captions; the reference's no-MASK branch dies on an
    unbound viewpoint_indexes).  Covers: caption-fragment sampling,
    more-captions-than-directions truncation, 'around' priority, the
    turn->go rewrite on all-forward direction sets, and the capitalized
    'Turn' variant."""
    from youtube_vln_tpu.data.instructions import (fill_template,
                                                   index_templates)
    ref_idx, ref_sig = ref.sort_skeletons(TEMPLATES)
    our_idx, our_sig = index_templates(TEMPLATES)

    cases = [
        # (captions, directions) matching each template's mask/omask counts
        (["kitchen with stove", "hall with rug"], [["left"]]),
        (["kitchen with stove", "hall with rug"], [["forward"]]),
        (["bedroom with bed", "bath with tub"],
         [["right", "forward"], ["around"]]),
        (["bedroom with bed", "bath with tub"],
         [["forward"], ["forward"]]),          # turn->go rewrite, 'Turn' too
        (["a with b", "c with d", "e with f"], [["left"]]),  # truncation
    ]
    for captions, directions in cases:
        sig = f"{len(captions)}_{len(directions)}"
        if sig not in ref_sig:
            continue
        for seed in range(40):
            random.seed(seed)
            got_ref = ref.run_insertion(captions, list(directions),
                                        TEMPLATES, ref_idx, ref_sig)
            got_ours = fill_template(captions, list(directions), TEMPLATES,
                                     our_idx, our_sig,
                                     rng=random.Random(seed))
            assert got_ref is not None and got_ours is not None, (sig, seed)
            assert got_ref[0] == got_ours[0], (sig, seed)
            assert got_ref[1] == got_ours[1], (sig, seed)

    # unmatched signature -> reference returns None, ours returns None
    random.seed(0)
    assert ref.run_insertion(["x with y"] * 4, [["left"]] * 9, TEMPLATES,
                             ref_idx, ref_sig) is None
    assert fill_template(["x with y"] * 4, [["left"]] * 9, TEMPLATES,
                         our_idx, our_sig, rng=random.Random(0)) is None


# --------------------------------------------------------------------------- #
# instruction generators (concatenate / rephrase) — exact parity
# --------------------------------------------------------------------------- #
def _framed(tok_ids, max_len=24, pad=0, cls=101, sep=102):
    row = [cls] + list(tok_ids) + [sep]
    return row + [pad] * (max_len - len(row))


def _caption_world():
    """photo_id_to_caption with plain, captionless and merged entries.
    Token sums >= 204 mean captioned (is_captionless threshold)."""
    caps = {
        1: {"instruction_tokens": [_framed([300, 310, 320])]},
        2: {"instruction_tokens": [_framed([3])]},               # captionless
        3: {"instruction_tokens": [_framed([400, 410, 420, 430, 440, 450,
                                            460, 470])]},        # long
        4: {"instruction_tokens": [_framed([500, 510])],
            "merging": [4, 5, 2], "weights": [0.5, 0.3, 0.2]},
        5: {"instruction_tokens": [_framed([600, 610, 620])]},
    }
    return caps


def test_concatenate_generator_exact_parity(ref, tmp_path):
    from youtube_vln_tpu.data.instructions import (
        ConcatenateInstructionGenerator)
    from youtube_vln_tpu.data.fixtures import write_fixture_vocab

    tok = write_fixture_vocab(tmp_path / "vocab.txt")
    caps = _caption_world()
    traj = [("l", 1), ("l", 2), ("l", (4, 5)), ("l", 3), ("l", 5)]
    for seps in ((), ("then", "and", ",", ".")):
        ref_gen = ref.ConcatenateInstructionGenerator(tok, seps, caps, 24)
        for seed in range(30):
            random.seed(seed)
            ref_out = ref_gen(list(traj))
            ours = ConcatenateInstructionGenerator(
                tok, seps, caps, 24, rng=random.Random(seed))(list(traj))
            assert list(ref_out) == list(ours), (seps, seed)


def test_rephrase_generator_exact_parity(ref, tmp_path):
    import json
    from youtube_vln_tpu.data.instructions import (
        RephraseInstructionGenerator)
    from youtube_vln_tpu.data.fixtures import write_fixture_vocab

    tok = write_fixture_vocab(tmp_path / "vocab.txt")
    caps = _caption_world()
    # skeletons: np flags mark slot positions; the reference loader also
    # requires distance/scan/path_id/path/heading/perturbations fields
    skel = []
    for i, (text, np_flags) in enumerate((
            ("walk to the stop there", [0, 0, 0, 1, 0, 0, 0]),
            ("go past the then the wait", [0, 0, 0, 1, 0, 0, 1, 0, 0]),
            ("head into the room", [0, 0, 0, 1, 0, 0]))):
        skel.append({"instructions": [text], "np": [np_flags],
                     "distance": 1.0, "scan": "s", "path_id": i,
                     "path": ["a"], "heading": 0.0,
                     "perturbations": [[]]})
    spath = tmp_path / "skeletons.json"
    spath.write_text(json.dumps(skel))

    # captioned-only trajectory slices matching 1- and 2-slot skeletons
    for traj in ([("l", 1)], [("l", 1), ("l", 3)]):
        ref_gen = ref.RephraseInstructionGenerator(str(spath), tok, (),
                                                   caps, 24)
        our_gen = RephraseInstructionGenerator(str(spath), tok, (), caps, 24)
        for seed in range(20):
            random.seed(seed)
            ref_out = ref_gen(list(traj))
            our_gen.rng = random.Random(seed)
            ours = our_gen(list(traj))
            assert list(ref_out) == list(ours), (len(traj), seed)


def test_ytb_rephrase_generator_exact_parity(ref, tmp_path):
    """End-to-end YTBRephraseInstructionGenerator vs the reference class:
    caption/action gathering (skips captionless, drops the last action),
    random_action redraws, template selection + fill, tokenize + frame.
    The tokenized-skeleton side cache is SHARED between the two runs, so
    it also pins ytb_load_tokens cache-format compatibility."""
    import json
    from youtube_vln_tpu.data.instructions import (
        YTBRephraseInstructionGenerator)
    from youtube_vln_tpu.data.fixtures import write_fixture_vocab

    tok = write_fixture_vocab(tmp_path / "vocab.txt")
    skel = [{"instructions": [t]} for t in (
        "walk past the [MASK] and turn [OMASK] at the [MASK] , then stop .",
        "go to the [MASK] . turn [OMASK] . walk into the [MASK] .",
        "find the [MASK] then go [OMASK] toward the [MASK] , turn [OMASK] "
        "and stop by the [MASK] .",
    )]
    spath = tmp_path / "ytb_skeletons.json"
    spath.write_text(json.dumps(skel))

    frames = {
        "vid/0000": {"caption": "kitchen with stove", "action": "left"},
        "vid/0001": {"caption": "", "action": "forward"},
        "vid/0002": {"caption": "hall with rug", "action": "right"},
        "vid/0003": {"caption": "", "action": "forward"},
        "vid/0005": {"caption": "bath with tub", "action": "around"},
    }
    traj2 = [("vid", (0,)), ("vid", (1,)), ("vid", (2,))]      # sig 2_1
    traj3 = [("vid", (0,)), ("vid", (2,)), ("vid", (3,)), ("vid", (5,))]

    for random_action in (False, True):
        ref_gen = ref.YTBRephraseInstructionGenerator(
            str(spath), random_action, tok, (), frames, 24)
        our_gen = YTBRephraseInstructionGenerator(
            str(spath), random_action, tok, (), frames, 24)
        for traj in (traj2, traj3):
            for seed in range(25):
                random.seed(seed)
                ref_ids, ref_tpl = ref_gen(list(traj))
                our_gen.rng = random.Random(seed)
                our_ids, our_tpl = our_gen(list(traj))
                assert list(ref_ids) == list(our_ids), (random_action, seed)
                assert ref_tpl == our_tpl, (random_action, seed)


def test_nav_graph_headings_exact_parity(ref, tmp_path, monkeypatch):
    """load_nav_graphs + get_headings vs the reference implementations on
    the same connectivity fixture: identical edge sets, edge weights,
    node positions, and heading chains (the reference loader hardcodes
    'data/connectivity/...', hence the chdir)."""
    from youtube_vln_tpu.data import fixtures as F
    from youtube_vln_tpu.data.nav_graph import (get_headings,
                                                load_nav_graphs)

    root = tmp_path / "data"
    F.build_r2r_fixture(root, n_scans=2, n_viewpoints=9)
    scans = sorted(p.name.split("_")[0]
                   for p in (root / "connectivity").glob("*_connectivity*"))

    monkeypatch.chdir(tmp_path)
    ref_graphs = ref.load_nav_graphs(scans)
    our_graphs = load_nav_graphs(scans, data_dir=str(root))

    rng = random.Random(3)
    for scan in scans:
        rg, og = ref_graphs[scan], our_graphs[scan]
        assert set(rg.edges) == set(og.edges)
        for u, v in rg.edges:
            np.testing.assert_allclose(rg[u][v]["weight"],
                                       og[u][v]["weight"], rtol=1e-12)
        rpos = dict(rg.nodes(data="position"))
        opos = dict(og.nodes(data="position"))
        assert set(rpos) == set(opos)
        for k in rpos:
            np.testing.assert_array_equal(rpos[k], opos[k])

        # heading chains over random walks
        nodes = sorted(og.nodes)
        for _ in range(10):
            path = [rng.choice(nodes)]
            for _ in range(4):
                nbrs = sorted(og.neighbors(path[-1]))
                if not nbrs:
                    break
                path.append(rng.choice(nbrs))
            h0 = rng.uniform(-np.pi, np.pi)
            np.testing.assert_allclose(
                get_headings(og, path, h0),
                ref.get_headings(rg, path, h0), rtol=1e-12)
