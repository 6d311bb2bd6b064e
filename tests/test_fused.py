"""Fused engines (single/double-gather): bit-exact vs scalar."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.dense import DensePMLEngine, build_dense_index
from movi_tpu.engine.fused import FusedPMLEngine, build_fused_index
from movi_tpu.engine.fused_search import (FusedCountEngine, FusedZMLEngine,
                                          build_fused_search_index)
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(47)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         bound_ff=1)
    return text, ix, ScalarEngine(ix)


def _reads(rng, text, count=50):
    reads = []
    for i in range(count):
        L = int(rng.integers(3, 70))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        if rng.random() < 0.6:
            pos = rng.integers(0, L, size=max(1, L // 8))
            seq[pos] = rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                  size=len(pos))
        reads.append((f"r{i}", seq.tobytes()))
    return reads


def test_fused_pml(setup):
    text, ix, sc = setup
    reads = _reads(np.random.default_rng(1), text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = FusedPMLEngine(build_fused_index(ix)).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_pml(seq), name


def test_dense_pml(setup):
    text, ix, sc = setup
    reads = _reads(np.random.default_rng(2), text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = DensePMLEngine(build_dense_index(ix)).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_pml(seq), name


def test_fused_count_and_zml(setup):
    text, ix, sc = setup
    reads = _reads(np.random.default_rng(3), text)
    batch = next(make_batches(reads, lanes=len(reads)))
    si = build_fused_search_index(ix)
    gc = FusedCountEngine(si).query_batch(batch)
    gz = FusedZMLEngine(si).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert gc[i] == sc.query_count(seq), name
        assert gz[i] == sc.query_zml(seq), name


def test_fused_long_read_chunked_scan():
    """Reads longer than FusedPMLEngine.CHUNK scan in carried chunks and
    stay bit-exact vs the scalar engine (the nanopore long-read path)."""
    import numpy as np

    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.cpu_ref.scalar import ScalarEngine
    from movi_tpu.engine.fused import FusedPMLEngine, build_fused_index
    from movi_tpu.index.structure import build_move_index
    from movi_tpu.io.fastx import make_batches

    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(bases, size=30000)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    eng = ScalarEngine(ix)
    fe = FusedPMLEngine(build_fused_index(ix))
    reads = []
    for i in range(4):
        L = int(rng.integers(5000, 9000))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seq = np.where(rng.random(L) < 0.05, rng.choice(bases, size=L), seq)
        seq[rng.integers(0, L, size=5)] = ord("N")
        reads.append((f"long{i}", seq.tobytes()))
    got = {}
    for b in make_batches(reads, lanes=4):
        for nm, r in zip(b.names, fe.query_batch(b)):
            got[nm] = r
    for nm, seq in reads:
        assert got[nm] == eng.query_pml(seq), nm
