"""Index construction tests (analogue of the reference's build-tests +
--verify flag: tests/test_build.cpp, move_structure_query.cpp:151-186)."""

import numpy as np
import pytest

from conftest import requires_ref_data

from movi_tpu.build.suffix import (
    _suffix_array_doubling, bwt_from_sa, build_bwt_runs, lcp_kasai,
    suffix_array,
)
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import MoveIndex, build_move_index


def test_suffix_array_small():
    text = np.frombuffer(b"ACAACG\x00", dtype=np.uint8)
    sa = suffix_array(text)
    suffixes = [bytes(text[i:]) for i in range(len(text))]
    expected = sorted(range(len(text)), key=lambda i: suffixes[i])
    assert list(sa) == expected


def test_bwt_banana_like():
    text = np.frombuffer(b"GCGCGCA\x00", dtype=np.uint8)
    sa = suffix_array(text)
    bwt = bwt_from_sa(text, sa)
    # BWT must be a permutation of the text
    assert sorted(bwt.tolist()) == sorted(text.tolist())


def test_lcp_matches_naive():
    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200)
    text = np.concatenate([seq, np.zeros(1, dtype=np.uint8)])
    sa = suffix_array(text)
    lcp = lcp_kasai(text, sa)
    for i in range(1, len(text)):
        a, b = bytes(text[sa[i - 1]:]), bytes(text[sa[i]:])
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[i] == k, i


def test_move_index_random_text_lf_loop():
    rng = np.random.default_rng(1)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=3000)
    runs = build_bwt_runs(seq)
    for mode in ["regular-thresholds", "large", "regular"]:
        ix = build_move_index(runs, mode)
        eng = ScalarEngine(ix)
        assert eng.verify_lf_loop(), mode


@requires_ref_data
def test_reference_build_stats(bwt_runs, index_regular_thr):
    ix = index_regular_thr
    assert ix.length == len(bwt_runs.bwt)
    assert ix.original_r == len(bwt_runs.starts)
    assert ix.r >= ix.original_r
    # row lengths sum to n and respect MAX_RUN_LENGTH = 2047 (mode 6)
    assert int(ix.n_arr.sum()) == ix.length
    assert int(ix.n_arr.max()) <= 2047
    assert sorted(ix.alphabet.tolist()) == [65, 67, 71, 84]


@requires_ref_data
def test_reference_lf_loop(index_regular_thr):
    assert ScalarEngine(index_regular_thr).verify_lf_loop()


@requires_ref_data
def test_index_save_load_roundtrip(index_regular_thr, tmp_path):
    p = str(tmp_path / "index.npz")
    index_regular_thr.save(p)
    ix2 = MoveIndex.load(p)
    assert ix2.r == index_regular_thr.r
    np.testing.assert_array_equal(ix2.id_arr, index_regular_thr.id_arr)
    np.testing.assert_array_equal(ix2.thr, index_regular_thr.thr)
    np.testing.assert_array_equal(ix2.first_runs, index_regular_thr.first_runs)
