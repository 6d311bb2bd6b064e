"""Bidirectional-cache k-mer count engine (engine/fused_kmer2.py) vs
the CPU oracle and the per-window device engine."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.engine.fused_kmer2 import FusedKmer2CountEngine
from movi_tpu.engine.fused_mem2 import build_fused_mem2_index
from movi_tpu.engine.fused_search2 import build_fused_search2_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches

COMP = {65: 84, 84: 65, 67: 71, 71: 67}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fw = rng.choice(bases, size=3000).astype(np.uint8)
    rc = np.array([COMP[b] for b in fw[::-1]], dtype=np.uint8)
    text = np.concatenate([fw, rc])
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    return (rng, bases, fw, AdvancedEngine(ix),
            build_fused_mem2_index(ix), build_fused_search2_index(ix))


def _reads(rng, bases, fw, n, k, with_n=False):
    reads = []
    for i in range(n):
        L = int(rng.integers(k + 1, 100))
        if i % 3 == 0:
            seq = rng.choice(bases, size=L)          # random (not found)
        else:
            s = int(rng.integers(0, len(fw) - L))
            seq = fw[s : s + L].copy()
            e = rng.random(L) < 0.04
            seq = np.where(e, rng.choice(bases, size=L), seq)
        if with_n and i % 4 == 0:
            seq[rng.integers(0, L, size=2)] = ord("N")
        reads.append((f"r{i}", np.asarray(seq, dtype=np.uint8).tobytes()))
    return reads


@pytest.mark.parametrize("k", [5, 11, 21])
def test_kmer2_counts_match_oracle(setup, k):
    rng, bases, fw, adv, m2, s2 = setup
    reads = _reads(rng, bases, fw, 30, k, with_n=True)
    eng = FusedKmer2CountEngine(m2, s2, k)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = eng.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == adv.count_kmers_bidirectional(seq, k), (name, k)


@pytest.mark.parametrize("p", [1, 2, 4, 9])
def test_kmer2_block_size_invariant(setup, p):
    """Counts are identical for ANY block size p (it only moves work
    between the shared right chain and the left chains)."""
    rng, bases, fw, adv, m2, s2 = setup
    k = 11
    reads = _reads(rng, bases, fw, 15, k)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmer2CountEngine(m2, s2, k, p=p).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == adv.count_kmers_bidirectional(seq, k), (name, p)


def test_kmer2_edge_cases(setup):
    rng, bases, fw, adv, m2, s2 = setup
    k = 9
    reads = [("tiny", b"ACG"), ("exactk", fw[50:59].tobytes()),
             ("allN", b"N" * 20), ("one", b"A"),
             ("kminus1", fw[10:18].tobytes())]
    eng = FusedKmer2CountEngine(m2, s2, k)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = eng.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == adv.count_kmers_bidirectional(seq, k), name


def test_kmer2_matches_paired_engine(setup):
    from movi_tpu.engine.fused_search2 import Fused2KmerCountEngine

    rng, bases, fw, adv, m2, s2 = setup
    k = 15
    reads = _reads(rng, bases, fw, 25, k, with_n=True)
    batch = next(make_batches(reads, lanes=len(reads)))
    assert (FusedKmer2CountEngine(m2, s2, k).query_batch(batch)
            == Fused2KmerCountEngine(s2, k).query_batch(batch))


def test_looks_rc_closed_rejects_count_symmetric_non_rc():
    """Regression: count symmetry (#A==#T, #C==#G) is not rc-closure.
    A complement-without-reversal text is count-symmetric but must NOT
    be routed to the bidirectional engine (it silently produced wrong
    counts there)."""
    from movi_tpu.build.suffix import build_bwt_runs as _b
    from movi_tpu.engine.fused_mem2 import looks_rc_closed
    from movi_tpu.index.structure import build_move_index as _bm

    rng = np.random.default_rng(41)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fw = rng.choice(bases, size=2000)
    comp = np.zeros(256, np.uint8)
    for a, b2 in zip(b"ACGT", b"TGCA"):
        comp[a] = b2
    ix_bad = _bm(_b(np.concatenate([fw, comp[fw]])),
                 "regular-thresholds", bound_ff=1)
    assert int(ix_bad.counts[0]) == int(ix_bad.counts[3])  # symmetric...
    assert not looks_rc_closed(ix_bad)                     # ...but caught
    ix_ok = _bm(_b(np.concatenate([fw, comp[fw][::-1]])),
                "regular-thresholds", bound_ff=1)
    assert looks_rc_closed(ix_ok)
    ix_fwo = _bm(_b(fw), "regular-thresholds", bound_ff=1)
    assert not looks_rc_closed(ix_fwo)
