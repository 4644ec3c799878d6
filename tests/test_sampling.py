"""Tests for temporal samplers (reference docstring examples as oracles)."""

import numpy as np
import pytest

from workoutdetector_tpu.data.sampling import (sample_frames, sparse_window_indices,
                                               tdn_sample_indices)


def test_sample_frames_deterministic():
    # oracles from reference transform.py:30-40
    assert sample_frames(4, 8, 0, False) == [0, 0, 1, 1, 2, 2, 3, 3]
    assert sample_frames(10, 8, 0, False) == [0, 1, 2, 3, 4, 5, 6, 7]
    assert sample_frames(40, 8, 0, False) == [0, 5, 10, 15, 20, 25, 30, 35]
    assert sample_frames(40, 8, 20, False) == [20, 25, 30, 35, 40, 45, 50, 55]


def test_sample_frames_random_invariants():
    rng = np.random.default_rng(0)
    for total in (9, 16, 40, 100, 1000):
        idx = sample_frames(total, 8, 0, True, rng)
        assert len(idx) == 8
        assert all(b > a for a, b in zip(idx, idx[1:])), idx
        assert all(0 <= i < total for i in idx)


def test_sample_frames_random_seeded_reproducible():
    a = sample_frames(100, 8, 0, True, np.random.default_rng(42))
    b = sample_frames(100, 8, 0, True, np.random.default_rng(42))
    assert a == b


def test_sample_frames_offset_random():
    rng = np.random.default_rng(1)
    idx = sample_frames(30, 8, 5, True, rng)
    assert all(5 <= i < 35 for i in idx)


def test_tdn_sample_indices():
    rng = np.random.default_rng(0)
    for total in (12, 40, 100):
        starts = tdn_sample_indices(total, 8, 5, rng)
        assert starts.shape == (8,)
        assert (starts >= 0).all()
        assert (starts + 5 <= total).all() or total < 13  # bursts fit (or tiny video)
    # deterministic mode
    s1 = tdn_sample_indices(100, 8, 5, random=False)
    s2 = tdn_sample_indices(100, 8, 5, random=False)
    assert (s1 == s2).all()


def test_sparse_window_indices():
    idx, valid = sparse_window_indices(0, 100)
    assert list(idx) == [0, 2, 4, 6, 8, 10, 12, 14]
    assert valid.all()
    # tail: start near end → clamped + masked
    idx, valid = sparse_window_indices(96, 100)
    assert list(idx[:2]) == [96, 98]
    assert valid[:2].all() and not valid[2:].any()
    assert (idx <= 99).all()
