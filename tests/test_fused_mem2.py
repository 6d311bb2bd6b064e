"""MEM engine v2 (engine/fused_mem2.py, one gather per tick) vs the CPU
oracle and the v1 engine."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.engine.fused_mem2 import (FusedMem2Engine,
                                        build_fused_mem2_index)
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
        build_fused_mem2_index(ix)


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
def test_mem2_matches_oracle(setup, L):
    rng, bases, fw, ix, adv, m2 = setup
    reads = _reads(rng, bases, fw, 30)
    eng = FusedMem2Engine(m2, L)
    got = {}
    for b in make_batches(reads, lanes=30):
        for nm, r in zip(b.names, eng.query_batch(b)):
            got[nm] = r
    for name, seq in reads:
        assert got[name] == adv.query_mems(seq, L), name


def test_mem2_edge_cases(setup):
    rng, bases, fw, ix, adv, m2 = setup
    reads = _reads(rng, bases, fw, 15, with_n=True)
    reads += [("short", b"ACG"), ("one", b"A"),
              ("allN", b"N" * 12)]
    for L in (2, 7):
        eng = FusedMem2Engine(m2, L)
        got = {}
        for b in make_batches(reads, lanes=18):
            for nm, r in zip(b.names, eng.query_batch(b)):
                got[nm] = r
        for name, seq in reads:
            assert got[name] == adv.query_mems(seq, L), (name, L)


def test_mem2_matches_v1(setup):
    """v2 == v1 on a mixed batch (both are oracle-exact; this pins the
    two device paths against each other directly)."""
    from movi_tpu.engine.fused_mem import (FusedMemEngine,
                                           build_fused_mem_index)

    rng, bases, fw, ix, adv, m2 = setup
    mi = build_fused_mem_index(ix)
    reads = _reads(rng, bases, fw, 20, with_n=True, prefix="v")
    for b in make_batches(reads, lanes=20):
        got1 = FusedMemEngine(mi, 12).query_batch(b)
        got2 = FusedMem2Engine(m2, 12).query_batch(b)
        assert got1 == got2


@pytest.mark.parametrize("fk", [4, 7, 12])
def test_mem2_ftab_anchor_matches_oracle(setup, fk):
    """ftab-anchored BML == the ftab-less oracle for every L around fk
    (hit path, miss/BSCAN path, and the fk == L full-cover case)."""
    rng, bases, fw, ix, adv, _ = setup
    m2f = build_fused_mem2_index(ix, ftab_k=fk)
    reads = _reads(rng, bases, fw, 20, with_n=True, prefix=f"f{fk}")
    reads += [("tiny", b"ACGTA"), ("allN", b"N" * 30)]
    for L in (fk, fk + 1, fk + 6, 20):
        if L < 2:
            continue
        eng = FusedMem2Engine(m2f, L)
        got = {}
        for b in make_batches(reads, lanes=len(reads)):
            for nm, r in zip(b.names, eng.query_batch(b)):
                got[nm] = r
        for name, seq in reads:
            assert got[name] == adv.query_mems(seq, L), (name, L, fk)


def test_mem2_long_reads_gather_branch(setup):
    """W > 512 drives the per-lane-gather char/emit branch and the
    carried tick quanta; oracle-exact."""
    rng, bases, fw, ix, adv, _ = setup
    m2f = build_fused_mem2_index(ix, ftab_k=6)
    reads = []
    for i in range(4):
        L = int(rng.integers(530, 700))
        s = int(rng.integers(0, len(fw) - L))
        seq = fw[s : s + L].copy()
        e = rng.random(L) < 0.03
        seq = np.where(e, rng.choice(bases, size=L), seq)
        reads.append((f"L{i}", seq.tobytes()))
    eng = FusedMem2Engine(m2f, 15)
    b = next(make_batches(reads, lanes=len(reads)))
    got = eng.query_batch(b)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == adv.query_mems(seq, 15), name


def test_mem2_ftab_multidoc_junctions():
    """Regression: on a multi-document no-separator reference, k-mers
    spanning document junctions have no rc partners; the ftab anchor's
    rc side must reproduce the ORACLE's incremental arithmetic (tracked
    rc_abs), not the rc code's own interval -- the old lookup produced
    over-extended MEMs (e.g. (0,63) for a true (0,5)+(1,63))."""
    rng = np.random.default_rng(82)
    bases = np.frombuffer(b"ACGT", np.uint8)
    docs = [rng.choice(bases, size=800) for _ in range(3)]
    comp = np.zeros(256, np.uint8)
    for a, b2 in zip(b"ACGT", b"TGCA"):
        comp[a] = b2
    parts = []
    for d in docs:
        parts += [d, comp[d][::-1]]     # per-doc rc, junctions between
    text = np.concatenate(parts)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    adv = AdvancedEngine(ix, ftab_k=0)
    reads = []
    for i in range(15):
        d = docs[int(rng.integers(0, 3))]
        L = int(rng.integers(40, 100))
        s = int(rng.integers(0, len(d) - L))
        reads.append((f"j{i}", d[s : s + L].tobytes()))
    for fk in (4, 5, 10):
        m2f = build_fused_mem2_index(ix, ftab_k=fk)
        for L in (5, 12):
            eng = FusedMem2Engine(m2f, L)
            b = next(make_batches(reads, lanes=len(reads)))
            got = eng.query_batch(b)
            for i, (name, seq) in enumerate(reads):
                assert got[i] == adv.query_mems(seq, L), (name, fk, L)


def test_all_mem2_matches_oracle(setup):
    """FusedAllMem2Engine == query_all_mems (mem_finder.cpp:105-145),
    including N-containing and edge reads, and == the v1 machine."""
    from movi_tpu.engine.fused_mem import (FusedAllMemEngine,
                                           build_fused_mem_index)
    from movi_tpu.engine.fused_mem2 import FusedAllMem2Engine

    rng, bases, fw, ix, adv, m2 = setup
    reads = _reads(rng, bases, fw, 25, with_n=True, prefix="am")
    reads += [("short", b"ACG"), ("one", b"A"), ("allN", b"N" * 12)]
    eng2 = FusedAllMem2Engine(m2)
    eng1 = FusedAllMemEngine(build_fused_mem_index(ix))
    for b in make_batches(reads, lanes=len(reads)):
        got2 = eng2.query_batch(b)
        got1 = eng1.query_batch(b)
        for i, (name, seq) in enumerate(reads):
            want = adv.query_all_mems(seq)
            assert got2[i] == want, name
            assert got1[i] == want, name


def test_all_mem2_empty_fw_count_first_run_gt1():
    """Regression: the empty-fw emission count must be 0 (oracle
    interval_count of EMPTY), not 1 - all_p[1] -- visible only on
    indexes whose first BWT run is longer than one row."""
    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGT", np.uint8)
    fw = rng.choice(bases, size=50)
    rc = np.array([COMP[b] for b in fw[::-1]], dtype=np.uint8)
    ix = build_move_index(build_bwt_runs(np.concatenate([fw, rc])),
                          "regular-thresholds", bound_ff=1)
    assert int(ix.n_arr[0]) > 1, "fixture must have a long first run"
    from movi_tpu.engine.fused_mem2 import FusedAllMem2Engine

    adv = AdvancedEngine(ix)
    eng = FusedAllMem2Engine(build_fused_mem2_index(ix))
    reads = [("n", b"N"), ("nn", b"NN"), ("mix", b"N" + fw[:9].tobytes()),
             ("tail", fw[5:20].tobytes() + b"N")]
    b = next(make_batches(reads, lanes=len(reads)))
    got = eng.query_batch(b)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == adv.query_all_mems(seq), name
