"""Paired (composed two-step) backward-search engines: count and ZML
must be bit-exact vs ScalarEngine and the one-step fused engines."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused_search import (FusedCountEngine, FusedZMLEngine,
                                          build_fused_search_index)
from movi_tpu.engine.fused_search2 import (Fused2CountEngine,
                                           Fused2ZMLEngine,
                                           build_fused_search2_index)
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    return text, ix, ScalarEngine(ix), build_fused_search2_index(ix)


def _reads(rng, text, count=64):
    reads = []
    for i in range(count):
        L = int(rng.integers(1, 70))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s: s + L].copy()
        if rng.random() < 0.6:
            pos = rng.integers(0, L, size=max(1, L // 8))
            seq[pos] = rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                  size=len(pos))
        reads.append((f"r{i}", seq.tobytes()))
    return reads


def test_paired_count_matches_scalar(setup):
    text, ix, sc, s2 = setup
    rng = np.random.default_rng(11)
    reads = _reads(rng, text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = Fused2CountEngine(s2).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_count(seq), name


def test_paired_zml_matches_scalar(setup):
    text, ix, sc, s2 = setup
    rng = np.random.default_rng(13)
    reads = _reads(rng, text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = Fused2ZMLEngine(s2).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_zml(seq), name


def test_paired_matches_one_step_engines(setup):
    """Paired and one-step fused engines agree on the same batch (the
    prefetch vs no-prefetch equality of the reference test suite)."""
    text, ix, sc, s2 = setup
    si = build_fused_search_index(ix)
    rng = np.random.default_rng(17)
    reads = _reads(rng, text, count=48)
    batch = next(make_batches(reads, lanes=len(reads)))
    assert (Fused2CountEngine(s2).query_batch(batch)
            == FusedCountEngine(si).query_batch(batch))
    assert (Fused2ZMLEngine(s2).query_batch(batch)
            == FusedZMLEngine(si).query_batch(batch))


def test_paired_long_reads_chunked(setup):
    """Reads longer than SCAN_CHUNK pairs exercise the carried-state
    chunk loop."""
    text, ix, sc, s2 = setup
    rng = np.random.default_rng(19)
    L = 2600  # > 2*SCAN_CHUNK bases across two chunks
    seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                           size=L).tobytes())
    reads = [("long", seq), ("short", text[10:40].tobytes())]
    batch = next(make_batches(reads, lanes=2))
    got_c = Fused2CountEngine(s2).query_batch(batch)
    got_z = Fused2ZMLEngine(s2).query_batch(batch)
    for i, (name, sq) in enumerate(reads):
        assert got_c[i] == sc.query_count(sq), name
        assert got_z[i] == sc.query_zml(sq), name


def test_paired_search_fuzz_degenerate_texts():
    """Degenerate texts (periodic, giant runs, 2-letter, single char)
    through the paired engines vs the scalar oracle."""
    rng = np.random.default_rng(111)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    texts = [
        rng.choice(bases, size=400).astype(np.uint8),
        np.tile(rng.choice(bases, size=13), 40).astype(np.uint8),
        np.repeat(bases, 120).astype(np.uint8),
        rng.choice(np.frombuffer(b"AC", np.uint8), size=400
                   ).astype(np.uint8),
        np.full(257, ord("G"), dtype=np.uint8),
    ]
    for t_i, text in enumerate(texts):
        ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                              bound_ff=1)
        sc = ScalarEngine(ix)
        s2 = build_fused_search2_index(ix)
        reads = []
        for i in range(12):
            L = int(rng.integers(1, 50))
            s = int(rng.integers(0, max(1, len(text) - L)))
            seq = bytearray(text[s: s + L].tobytes())
            for _ in range(int(rng.integers(0, 3))):
                seq[int(rng.integers(0, L))] = int(
                    rng.choice(np.frombuffer(b"ACGTNX", np.uint8)))
            reads.append((f"r{i}", bytes(seq)))
        batch = next(make_batches(reads, lanes=len(reads)))
        got_c = Fused2CountEngine(s2).query_batch(batch)
        got_z = Fused2ZMLEngine(s2).query_batch(batch)
        for i, (name, seq) in enumerate(reads):
            assert got_c[i] == sc.query_count(seq), (t_i, name)
            assert got_z[i] == sc.query_zml(seq), (t_i, name)


def test_paired_search_cache_roundtrip(tmp_path, setup):
    from movi_tpu.engine.fused_search2 import (load_fused_search2_index,
                                               save_fused_search2_index)

    text, ix, sc, s2 = setup
    path = str(tmp_path / "s2.npz")
    save_fused_search2_index(s2, path)
    s2b = load_fused_search2_index(path)
    assert s2b.r == s2.r and s2b.sigma == s2.sigma
    assert np.array_equal(np.asarray(s2b.rec_all), np.asarray(s2.rec_all))
    rng = np.random.default_rng(23)
    reads = _reads(rng, text, count=8)
    batch = next(make_batches(reads, lanes=len(reads)))
    assert (Fused2CountEngine(s2b).query_batch(batch)
            == Fused2CountEngine(s2).query_batch(batch))


def test_paired_kmer_counts_match_one_step(setup):
    """Fused2KmerCountEngine == FusedKmerCountEngine (itself tested
    against the bidirectional scalar oracle) for several k, including
    even/odd extension counts and reads with illegal chars."""
    from movi_tpu.engine.fused_kmer import FusedKmerCountEngine
    from movi_tpu.engine.fused_search2 import Fused2KmerCountEngine

    text, ix, sc, s2 = setup
    si = build_fused_search_index(ix)
    rng = np.random.default_rng(29)
    reads = _reads(rng, text, count=24)
    batch = next(make_batches(reads, lanes=len(reads)))
    for k in (4, 5, 12, 31):
        want = FusedKmerCountEngine(si, k).query_batch(batch)
        got = Fused2KmerCountEngine(s2, k).query_batch(batch)
        assert got == want, k
