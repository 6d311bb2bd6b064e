"""Count (backward search) and ZML: JAX engine == scalar engine, and
count queries cross-validated against brute-force substring counting."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.device_index import build_device_index
from movi_tpu.engine.search import CountEngine, ZMLEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds")
    return text, ix, ScalarEngine(ix), build_device_index(ix)


def _reads(rng, text, count=60):
    reads = []
    for i in range(count):
        L = int(rng.integers(3, 60))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        if rng.random() < 0.6:
            pos = rng.integers(0, L, size=max(1, L // 8))
            seq[pos] = rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                  size=len(pos))
        reads.append((f"r{i}", seq.tobytes()))
    return reads


def _overlapping_count(hay: bytes, needle: bytes) -> int:
    n, i = 0, hay.find(needle)
    while i >= 0:
        n += 1
        i = hay.find(needle, i + 1)
    return n


def test_count_jax_matches_scalar_and_bruteforce(setup):
    text, ix, sc, di = setup
    rng = np.random.default_rng(11)
    reads = _reads(rng, text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = CountEngine(di).query_batch(batch)
    hay = text.tobytes() + b"\x00"
    for i, (name, seq) in enumerate(reads):
        pos, cnt = sc.query_count(seq)
        assert got[i] == (pos, cnt), name
        matched = len(seq) - pos
        if matched > 0 and b"N" not in seq[pos:]:
            assert cnt == _overlapping_count(hay, seq[pos:]), name
            # maximality: one more char must not be findable (when legal)
            if pos > 0 and seq[pos - 1 : pos] in b"ACGT":
                assert _overlapping_count(hay, seq[pos - 1 :]) == 0, name


def test_zml_jax_matches_scalar(setup):
    text, ix, sc, di = setup
    rng = np.random.default_rng(13)
    reads = _reads(rng, text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = ZMLEngine(di).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_zml(seq), name


def test_count_exact_substring(setup):
    """Full-read exact matches report len/len and the true count."""
    text, ix, sc, di = setup
    hay = text.tobytes()
    reads = [(f"e{i}", hay[i * 37 : i * 37 + 25]) for i in range(20)]
    batch = next(make_batches(reads, lanes=len(reads)))
    got = CountEngine(di).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        pos, cnt = got[i]
        assert pos == 0, name
        assert cnt == _overlapping_count(hay + b"\x00", seq), name


def test_long_read_chunked_search_scans():
    """Count/ZML/color scans on reads longer than the scan chunk stay
    bit-exact vs the scalar engine (carried-chunk long-read path)."""
    import numpy as np

    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.color import ColorEngine, DocumentInfo, build_color_table
    from movi_tpu.cpu_ref.scalar import ScalarEngine
    from movi_tpu.engine.fused_color import (FusedColorEngine,
                                             build_fused_color_index)
    from movi_tpu.engine.fused_search import (FusedCountEngine,
                                              FusedZMLEngine,
                                              build_fused_search_index)
    from movi_tpu.index.structure import build_move_index
    from movi_tpu.io.fastx import make_batches

    rng = np.random.default_rng(29)
    bases = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(bases, size=30000)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
    scalar = ScalarEngine(ix)
    si = build_fused_search_index(ix)
    di = DocumentInfo.create([15000, 30000])
    ct = build_color_table(ix, runs.sa, di)
    ci = build_fused_color_index(ix, ct)

    reads = []
    for i in range(3):
        L = int(rng.integers(4000, 7000))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seq = np.where(rng.random(L) < 0.05, rng.choice(bases, size=L), seq)
        reads.append((f"long{i}", seq.tobytes()))

    ce, ze = FusedCountEngine(si), FusedZMLEngine(si)
    fc = FusedColorEngine(ci, ct)
    sc = ColorEngine(ix, ct)
    for b in make_batches(reads, lanes=3):
        counts = ce.query_batch(b)
        zmls = ze.query_batch(b)
        colors = fc.query_batch(b)
        for i, (nm, seq) in enumerate(zip(b.names, (s for _, s in reads))):
            assert counts[i] == scalar.query_count(seq), nm
            assert zmls[i] == scalar.query_zml(seq), nm
            pmls, cell = sc.query_pml_multiclass(seq)
            assert colors[i][0] == pmls and colors[i][1] == cell, nm
