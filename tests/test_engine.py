"""JAX engine vs scalar engine bit-exactness (the analogue of the
reference's prefetch-vs-no-prefetch golden tests, tests/test_pml.cpp)."""

import numpy as np
import pytest

from conftest import requires_ref_data

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.device_index import build_device_index
from movi_tpu.engine.pml import PMLEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import ReadBatch, make_batches


def _random_reads(rng, count, minlen=5, maxlen=80, with_junk=True):
    reads = []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(count):
        L = int(rng.integers(minlen, maxlen))
        seq = rng.choice(bases, size=L).astype(np.uint8)
        if with_junk and rng.random() < 0.5:
            # sprinkle illegal characters (N, lowercase)
            pos = rng.integers(0, L, size=max(1, L // 10))
            seq[pos] = ord("N")
        reads.append((f"r{i}", seq.tobytes()))
    return reads


@pytest.fixture(scope="module")
def small_setup():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    return ix, ScalarEngine(ix), build_device_index(ix)


def test_jax_pml_matches_scalar_random(small_setup):
    ix, scalar, di = small_setup
    rng = np.random.default_rng(11)
    reads = _random_reads(rng, 40)
    pe = PMLEngine(di)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = pe.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == scalar.query_pml(seq), name


def test_jax_pml_random_repositioning(small_setup):
    # no-thresholds path (rpml): deterministic offset*2 < n direction
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular")
    scalar = ScalarEngine(ix)
    di = build_device_index(ix)
    pe = PMLEngine(di, random_repositioning=True)
    reads = _random_reads(rng, 20, with_junk=False)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = pe.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == scalar.query_pml(seq, random_repositioning=True), name


@requires_ref_data
def test_jax_pml_matches_scalar_reference(index_regular_thr, sample_reads):
    scalar = ScalarEngine(index_regular_thr)
    di = build_device_index(index_regular_thr)
    pe = PMLEngine(di)
    batch = next(make_batches(sample_reads, lanes=len(sample_reads)))
    got = pe.query_batch(batch)
    for i, (name, seq) in enumerate(sample_reads):
        assert got[i] == scalar.query_pml(seq), name


def test_variable_length_batch(small_setup):
    ix, scalar, di = small_setup
    rng = np.random.default_rng(17)
    reads = _random_reads(rng, 17, minlen=1, maxlen=64)
    pe = PMLEngine(di)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = pe.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == scalar.query_pml(seq), name
