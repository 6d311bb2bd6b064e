"""Native single-core search/kmer/MEM baselines vs the Python oracles.

These loops are the MEASURED CPU denominators for bench.py's
vs_baseline_* ratios; each must agree with the corresponding oracle
(ScalarEngine / AdvancedEngine) on the same index and reads.
"""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.cpu_ref.native_search import (
    NativeSearchCtx, native_count_checksum, native_kmer_count,
    native_kmer_membership, native_mem_bml, native_search_available,
    native_zml_checksum, reads_to_slots)
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import build_move_index

pytestmark = pytest.mark.skipif(not native_search_available(),
                                reason="native library not built")

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = {65: 84, 67: 71, 71: 67, 84: 65}


def _revcomp(text: np.ndarray) -> np.ndarray:
    return np.array([_COMP[int(c)] for c in text[::-1]], dtype=np.uint8)


def _make_reads(rng, text, n, L, err=0.05, with_n=True):
    starts = rng.integers(0, len(text) - L, size=n)
    reads = np.stack([text[s:s + L] for s in starts])
    e = rng.random(reads.shape) < err
    reads = np.where(e, rng.choice(_BASES, size=reads.shape), reads)
    if with_n:
        nn = rng.random(reads.shape) < 0.01
        reads = np.where(nn, np.uint8(ord("N")), reads)
    return reads


@pytest.fixture(scope="module")
def rc_index():
    """Small rc-complete index (bidirectional search needs revcomp)."""
    rng = np.random.default_rng(7)
    half = rng.choice(_BASES, size=3000).astype(np.uint8)
    text = np.concatenate([half, _revcomp(half)])
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    return ix, text


def test_native_count_zml_match_scalar(rc_index):
    ix, text = rc_index
    sc = ScalarEngine(ix)
    rng = np.random.default_rng(3)
    reads = _make_reads(rng, text, 30, 70)
    slots = reads_to_slots(ix, reads)
    ctx = NativeSearchCtx(ix)

    want_count = 0
    want_zml = 0
    for row in reads:
        seq = row.tobytes()
        pos, cnt = sc.query_count(seq)
        want_count += (len(seq) - pos) + cnt
        want_zml += sum(sc.query_zml(seq))
    assert native_count_checksum(ctx, slots) == want_count
    assert native_zml_checksum(ctx, slots) == want_zml


def test_native_kmer_membership_matches_oracle(rc_index):
    ix, text = rc_index
    eng = AdvancedEngine(ix)
    rng = np.random.default_rng(5)
    reads = _make_reads(rng, text, 25, 90)
    slots = reads_to_slots(ix, reads)
    ctx = NativeSearchCtx(ix)
    k = 11
    want = 0
    for row in reads:
        want += sum(f for _, f in eng.query_all_kmers(row.tobytes(), k))
    assert native_kmer_membership(ctx, slots, k) == want


def test_native_kmer_count_matches_oracle(rc_index):
    ix, text = rc_index
    eng = AdvancedEngine(ix)
    rng = np.random.default_rng(9)
    reads = _make_reads(rng, text, 20, 80)
    slots = reads_to_slots(ix, reads)
    ctx = NativeSearchCtx(ix, with_bidir=True)
    for k in (8, 11):
        want_f = want_t = 0
        for row in reads:
            f, t = eng.count_kmers_bidirectional(row.tobytes(), k)
            want_f += f
            want_t += t
        got_f, got_t = native_kmer_count(ctx, slots, k)
        assert (got_f, got_t) == (want_f, want_t), k


def test_native_mem_bml_matches_oracle(rc_index):
    ix, text = rc_index
    eng = AdvancedEngine(ix)
    rng = np.random.default_rng(13)
    reads = _make_reads(rng, text, 20, 80)
    slots = reads_to_slots(ix, reads)
    ctx = NativeSearchCtx(ix, with_bidir=True)
    for L in (8, 15):
        want_cs = want_n = 0
        for row in reads:
            mems = eng.query_mems(row.tobytes(), L)
            want_n += len(mems)
            want_cs += sum(s * 3 + e * 5 + c * 7 for s, e, c in mems)
        got_cs, got_n = native_mem_bml(ctx, slots, L)
        assert (got_cs, got_n) == (want_cs, want_n), L
