"""Device MEM engine (engine/fused_mem.py) vs the CPU oracle
(AdvancedEngine.query_mems, mem_finder.cpp:29-103)."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.engine.fused_mem import FusedMemEngine, build_fused_mem_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches

COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def _rc_text(fw):
    rc = np.array([COMP[b] for b in fw[::-1]], dtype=np.uint8)
    return np.concatenate([fw, rc])


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fw = rng.choice(bases, size=4000)
    text = _rc_text(fw)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
    return rng, bases, fw, ix, AdvancedEngine(ix, ftab_k=0), \
        build_fused_mem_index(ix)


def _reads(rng, bases, fw, n, err=0.05, with_n=False, prefix="r"):
    reads = []
    for i in range(n):
        L = int(rng.integers(25, 90))
        s = int(rng.integers(0, len(fw) - L))
        seq = fw[s : s + L].copy()
        e = rng.random(L) < err
        seq = np.where(e, rng.choice(bases, size=L), seq)
        if with_n:
            seq[rng.integers(0, L, size=2)] = ord("N")
        reads.append((f"{prefix}{i}", seq.tobytes()))
    return reads


@pytest.mark.parametrize("L", [2, 5, 12, 20])
def test_fused_mems_match_oracle(setup, L):
    rng, bases, fw, ix, adv, mi = setup
    reads = _reads(rng, bases, fw, 30)
    eng = FusedMemEngine(mi, L)
    got = {}
    for b in make_batches(reads, lanes=30):
        for nm, r in zip(b.names, eng.query_batch(b)):
            got[nm] = r
    for name, seq in reads:
        assert got[name] == adv.query_mems(seq, L), name


def test_fused_mems_edge_cases(setup):
    rng, bases, fw, ix, adv, mi = setup
    reads = _reads(rng, bases, fw, 15, with_n=True)
    reads += [("short", b"ACG"), ("one", b"A"),
              ("allN", b"N" * 12)]
    for L in (2, 7):
        eng = FusedMemEngine(mi, L)
        got = {}
        for b in make_batches(reads, lanes=18):
            for nm, r in zip(b.names, eng.query_batch(b)):
                got[nm] = r
        for name, seq in reads:
            assert got[name] == adv.query_mems(seq, L), (name, L)


def test_fused_all_mems_match_oracle(setup):
    """FusedAllMemEngine == query_all_mems (mem_finder.cpp:105-145)."""
    from movi_tpu.engine.fused_mem import FusedAllMemEngine

    rng, bases, fw, ix, adv, mi = setup
    reads = _reads(rng, bases, fw, 25)
    reads += _reads(rng, bases, fw, 8, with_n=True, prefix="n")
    reads += [("tiny", b"ACG"), ("one", b"A")]
    eng = FusedAllMemEngine(mi)
    got = {}
    for b in make_batches(reads, lanes=len(reads)):
        for nm, r in zip(b.names, eng.query_batch(b)):
            got[nm] = r
    for name, seq in reads:
        assert got[name] == adv.query_all_mems(seq), name


def test_mem_lane_compaction_matches_oracle(setup, monkeypatch):
    """Lane compaction (retired lanes fold out between tick quanta so
    the straggler tail runs on a small bucket) is output-invariant: with
    a tiny bucket floor forcing multiple compactions, the results still
    match the oracle exactly."""
    from movi_tpu.engine import fused_mem
    from movi_tpu.engine.fused_mem import FusedAllMemEngine

    rng, bases, fw, ix, adv, mi = setup
    monkeypatch.setattr(fused_mem, "_MIN_BUCKET", 4)
    # mixed difficulty: clean reads retire fast, high-error reads
    # straggle -> several compaction rounds
    reads = (_reads(rng, bases, fw, 20, err=0.0, prefix="c")
             + _reads(rng, bases, fw, 20, err=0.25, prefix="e"))
    batch = next(make_batches(reads, lanes=len(reads)))
    L = 12
    eng = FusedMemEngine(mi, L)
    got = eng.query_batch(batch)
    for (name, seq), mems in zip(reads, got):
        assert mems == adv.query_mems(seq, L), name

    alle = FusedAllMemEngine(mi)
    got = alle.query_batch(batch)
    for (name, seq), mems in zip(reads, got):
        assert mems == adv.query_all_mems(seq), name
