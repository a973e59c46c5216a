"""Unit tests for the pure-index triplet/window math.

These pin the reference's indexing contract, incl. the d2/d4 offset rule
(`/root/reference/src/ModelDataGenerator.py:150-162`).
"""

import numpy as np
import pytest

from mrisr_tpu.data.triplets import (
    TripletIndex,
    WindowIndex,
    eval_hierarchical_pairs,
    eval_progressive_windows,
    eval_volume_triplets,
    num_triplets,
    triplet_slice_ids,
)


def test_num_triplets_counts():
    # 60-slice series: 58 d2 + 56 d4 = 114 (SURVEY.md D5/D6)
    assert num_triplets(60) == 114
    assert num_triplets(60, 2) == 58
    assert num_triplets(60, 4) == 56
    assert num_triplets(2) == 0
    assert num_triplets(3) == 1          # one d2, no d4
    assert num_triplets(4, 4) == 0
    assert num_triplets(5, 4) == 1


def test_triplet_slice_ids_d2_d4_boundary():
    n = 60
    # first d2 triplet
    assert triplet_slice_ids(n, 0) == (0, 1, 2, 2)
    # last d2 triplet: i = 57 -> (57, 58, 59)
    assert triplet_slice_ids(n, 57) == (57, 58, 59, 2)
    # first d4 triplet sits at offset n-2 = 58
    assert triplet_slice_ids(n, 58) == (0, 2, 4, 4)
    # last d4 triplet: t = 58 + 55 -> i = 55 -> (55, 57, 59)
    assert triplet_slice_ids(n, 113) == (55, 57, 59, 4)


def test_index_matches_reference_loop():
    """Cross-check the vectorized index against a literal transcription of the
    reference's index-building loop."""
    counts = [60, 7, 2, 5]
    for distance_filter in (None, 2, 4):
        expected = []
        for sid, n in enumerate(counts):
            if n < 3:
                continue
            n_d2 = n - 2
            if distance_filter in (None, 2):
                for t in range(n_d2):
                    expected.append((sid, t))
            if distance_filter in (None, 4):
                for t in range(max(n - 4, 0)):
                    expected.append((sid, n_d2 + t))
        idx = TripletIndex(counts, distance_filter=distance_filter)
        got = list(zip(idx.series_ids.tolist(), idx.triplet_ids.tolist()))
        assert got == expected, distance_filter


def test_slice_plan_consistency():
    counts = [60, 10]
    idx = TripletIndex(counts, distance_filter=None)
    plan = idx.slice_plan()
    for row, (sid, tid) in zip(plan, zip(idx.series_ids, idx.triplet_ids)):
        n = counts[sid]
        pre, mid, post, dist = triplet_slice_ids(n, int(tid))
        assert tuple(row) == (sid, pre, mid, post, dist)
        # geometric invariants
        assert row[2] == (row[1] + row[3]) // 2
        assert row[3] - row[1] == row[4]
        assert row[3] < n


def test_distance4_offset_preserved_under_filtering():
    """With distance_filter=4, triplet ids still start at n-2 (the reference
    keeps computing n_triplets_d2 'for distance 4 offset')."""
    idx = TripletIndex([10], distance_filter=4)
    assert idx.triplet_ids.min() == 8  # n-2
    plan = idx.slice_plan()
    assert (plan[:, 4] == 4).all()
    assert plan[0, 1] == 0 and plan[0, 2] == 2 and plan[0, 3] == 4


def test_window_index():
    idx = WindowIndex([60, 4, 5])
    # 60-4 = 56 windows + 0 + 1
    assert len(idx) == 57
    plan = idx.slice_plan()
    assert plan.shape == (57, 6)
    assert (plan[:, 5] - plan[:, 1] == 4).all()
    # last window of first series starts at 55
    assert plan[55, 1] == 55 and plan[55, 0] == 0
    assert plan[56, 0] == 2 and plan[56, 1] == 0


def test_eval_generators():
    t = eval_volume_triplets(60)
    # stride-2 even i: i in 0..56 -> 29 triplets
    assert t.shape == (29, 3)
    assert (t[:, 0] % 2 == 0).all()
    assert (t[:, 1] == t[:, 0] + 1).all()

    w = eval_progressive_windows(60)
    assert w.shape == (56, 5)

    h = eval_hierarchical_pairs(60)
    assert h.shape == (56, 5)
    assert (h[:, 4] == h[:, 0] + 4).all()


def test_recursive_bisection_triplets():
    from mrisr_tpu.data.triplets import recursive_bisection_triplets

    t = recursive_bisection_triplets(5)  # span [0, 4]
    # pre-order: (0,2,4) then left half (0,1,2) then right half (2,3,4)
    assert t.tolist() == [[0, 2, 4], [0, 1, 2], [2, 3, 4]]
    # midpoints always strictly inside, gaps halve down to 2
    t = recursive_bisection_triplets(60)
    assert (t[:, 0] < t[:, 1]).all() and (t[:, 1] < t[:, 2]).all()
    assert (t[:, 1] == (t[:, 0] + t[:, 2]) // 2).all()
    # every interior slice gets covered as a midpoint exactly once
    mids = sorted(t[:, 1].tolist())
    assert len(set(mids)) == len(mids)
    assert recursive_bisection_triplets(2).shape == (0, 3)
