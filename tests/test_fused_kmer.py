"""Device k-mer membership engine == scalar query_all_kmers."""

import numpy as np
import pytest

from movi_tpu.build.prepare_ref import revcomp
from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.engine.fused_kmer import FusedKmerEngine
from movi_tpu.engine.fused_search import build_fused_search_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fw = rng.choice(bases, size=2500).astype(np.uint8)
    text = np.concatenate([fw, revcomp(fw)])
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         bound_ff=1)
    return text, AdvancedEngine(ix, ftab_k=0), build_fused_search_index(ix)


@pytest.mark.parametrize("k", [5, 11, 21])
def test_fused_kmer_matches_scalar(setup, k):
    text, sc, si = setup
    rng = np.random.default_rng(100 + k)
    reads = []
    for i in range(30):
        L = int(rng.integers(k + 1, 80))
        s = int(rng.integers(0, len(text) - L))
        seq = bytearray(text[s : s + L].tobytes())
        for _ in range(int(rng.integers(0, 5))):
            seq[int(rng.integers(0, L))] = int(
                rng.choice(np.frombuffer(b"ACGTN", np.uint8)))
        reads.append((f"r{i}", bytes(seq)))
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(si, k).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, k), name


def test_fused_kmer_short_reads(setup):
    text, sc, si = setup
    reads = [("tiny", b"ACG"), ("exact", text[10:21].tobytes()),
             ("allN", b"N" * 15)]
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(si, 11).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, 11), name


def test_fused_kmer_counts_match_oracle():
    """FusedKmerCountEngine == count_kmers_bidirectional (exact counts,
    sequitur.cpp:14-255 semantics)."""
    import numpy as np

    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.cpu_ref.advanced import AdvancedEngine
    from movi_tpu.engine.fused_kmer import FusedKmerCountEngine
    from movi_tpu.engine.fused_search import build_fused_search_index
    from movi_tpu.index.structure import build_move_index
    from movi_tpu.io.fastx import make_batches

    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(bases, size=6000)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
    adv = AdvancedEngine(ix, ftab_k=0)
    si = build_fused_search_index(ix)
    reads = []
    for i in range(20):
        L = int(rng.integers(35, 120))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seq = np.where(rng.random(L) < 0.03, rng.choice(bases, size=L), seq)
        if i % 5 == 0:
            seq[rng.integers(0, L, size=2)] = ord("N")
        reads.append((f"r{i}", seq.tobytes()))
    reads.append(("tiny", b"ACG"))
    for k in (5, 31):
        eng = FusedKmerCountEngine(si, k)
        got = {}
        for b in make_batches(reads, lanes=21):
            for nm, r in zip(b.names, eng.query_batch(b)):
                got[nm] = r
        for nm, seq in reads:
            assert got[nm] == adv.count_kmers_bidirectional(seq, k), (nm, k)


def test_kmer_lane_compaction_matches_scalar(setup, monkeypatch):
    """Lane compaction in the membership machine (retired lanes fold
    out between tick quanta, fused_mem._resume_compacted) is
    output-invariant under a tiny bucket floor."""
    from movi_tpu.engine import fused_mem

    monkeypatch.setattr(fused_mem, "_MIN_BUCKET", 4)
    text, sc, si = setup
    rng = np.random.default_rng(321)
    k = 11
    reads = []
    for i in range(32):
        L = int(rng.integers(k + 1, 90))
        s = int(rng.integers(0, len(text) - L))
        seq = bytearray(text[s : s + L].tobytes())
        err = 0 if i % 2 == 0 else int(L // 4)  # stragglers vs clean
        for _ in range(err):
            seq[int(rng.integers(0, L))] = int(
                rng.choice(np.frombuffer(b"ACGTN", np.uint8)))
        reads.append((f"r{i}", bytes(seq)))
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(si, k).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, k), name


@pytest.mark.parametrize("k", [9, 15])
def test_fused_kmer_probe_random_reads(setup, k):
    """NOT_FOUND-heavy (random) and mixed reads drive the look-ahead
    probe phase hard; emissions must still equal the oracle's."""
    text, sc, si = setup
    rng = np.random.default_rng(500 + k)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(20):
        L = int(rng.integers(k + 2, 90))
        if i % 2 == 0:
            seq = rng.choice(bases, size=L)          # pure random
        else:
            s = int(rng.integers(0, len(text) - L))  # half-matchy
            seq = text[s : s + L].copy()
            half = L // 2
            seq[half:] = rng.choice(bases, size=L - half)
        if i % 5 == 0:
            seq[int(rng.integers(0, L))] = ord("N")
        reads.append((f"p{i}", seq.tobytes()))
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(si, k).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, k), name


@pytest.mark.parametrize("fk,k", [(4, 9), (6, 15), (6, 9)])
def test_fused_kmer_ftab_anchor_matches_scalar(setup, fk, k):
    """ftab-anchored membership == the ftab-less oracle (stretch hit,
    stretch miss, probe hit, probe instant-fail paths)."""
    from movi_tpu.build.suffix import build_bwt_runs as _b
    from movi_tpu.index.structure import build_move_index as _bm

    text, sc, si = setup
    sif = build_fused_search_index(
        _bm(_b(text), "regular-thresholds", bound_ff=1), ftab_k=fk)
    rng = np.random.default_rng(900 + fk * 100 + k)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(24):
        L = int(rng.integers(k + 2, 90))
        if i % 2 == 0:
            seq = rng.choice(bases, size=L)
        else:
            s0 = int(rng.integers(0, len(text) - L))
            seq = text[s0 : s0 + L].copy()
            half = L // 2
            seq[half:] = rng.choice(bases, size=L - half)
        if i % 5 == 0:
            seq[int(rng.integers(0, L))] = ord("N")
        reads.append((f"t{i}", np.asarray(seq, np.uint8).tobytes()))
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(sif, k).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, k), (name, fk, k)


def test_fused_kmer_long_reads_gather_branch(setup):
    """W > 512 drives the per-lane-gather select branch (with ftab
    codes); oracle-exact."""
    from movi_tpu.build.suffix import build_bwt_runs as _b
    from movi_tpu.index.structure import build_move_index as _bm

    text, sc, si = setup
    sif = build_fused_search_index(
        _bm(_b(text), "regular-thresholds", bound_ff=1), ftab_k=6)
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(4):
        L = int(rng.integers(530, 700))
        if i % 2 == 0:
            seq = rng.choice(bases, size=L)
        else:
            s0 = int(rng.integers(0, len(text) - L))
            seq = text[s0 : s0 + L].copy()
        reads.append((f"L{i}", np.asarray(seq, np.uint8).tobytes()))
    b = next(make_batches(reads, lanes=len(reads)))
    k = 15
    got = FusedKmerEngine(sif, k).query_batch(b)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, k), name


def test_fused_kmer_ftab_forward_only_index():
    """Regression: ftab anchor rows must use fw-only validity -- on a
    forward-only (non-rc) index every membership anchor previously hit
    a falsely-empty row and reported zero found k-mers."""
    from movi_tpu.build.suffix import build_bwt_runs as _b
    from movi_tpu.cpu_ref.advanced import AdvancedEngine as _A
    from movi_tpu.index.structure import build_move_index as _bm

    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fw = rng.choice(bases, size=2500)
    ix = _bm(_b(fw), "regular-thresholds", bound_ff=1)
    sc = _A(ix)
    sif = build_fused_search_index(ix, ftab_k=6)
    reads = []
    for i in range(12):
        s0 = int(rng.integers(0, len(fw) - 60))
        reads.append((f"r{i}", fw[s0 : s0 + 60].tobytes()))
    b = next(make_batches(reads, lanes=len(reads)))
    got = FusedKmerEngine(sif, 11).query_batch(b)
    assert any(got[i] for i in range(len(reads)))  # not all empty
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_all_kmers(seq, 11), name
