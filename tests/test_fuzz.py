"""Property fuzzing: random texts (incl. degenerate ones) through every
mode and engine, cross-checked for agreement and against brute force."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.device_index import build_device_index
from movi_tpu.engine.fused import FusedPMLEngine, build_fused_index
from movi_tpu.engine.pml import PMLEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches

MODES = ["regular-thresholds", "large", "sampled-thresholds",
         "blocked-thresholds", "constant", "split"]


def _texts(rng):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    yield rng.choice(bases, size=300).astype(np.uint8)           # random
    yield np.tile(rng.choice(bases, size=13), 40).astype(np.uint8)  # periodic
    yield np.repeat(bases, 120).astype(np.uint8)                  # 4 giant runs
    two = np.frombuffer(b"AC", dtype=np.uint8)
    yield rng.choice(two, size=400).astype(np.uint8)              # 2-letter
    yield np.full(257, ord("G"), dtype=np.uint8)                  # single char


def test_fuzz_modes_agree():
    rng = np.random.default_rng(111)
    for t_i, text in enumerate(_texts(rng)):
        runs = build_bwt_runs(text)
        engines = {}
        for mode in MODES:
            ix = build_move_index(runs, mode,
                                  bound_ff=4 if mode in ("constant", "split")
                                  else None)
            eng = ScalarEngine(ix)
            assert eng.verify_lf_loop(), (t_i, mode)
            engines[mode] = eng
        reads = []
        present = np.unique(text)
        for i in range(8):
            L = int(rng.integers(2, 40))
            s = int(rng.integers(0, max(1, len(text) - L)))
            seq = bytearray(text[s : s + L].tobytes())
            if i % 3 == 0 and L > 2:
                seq[int(rng.integers(0, L))] = ord("T") if ord("T") in \
                    present or True else ord("A")
            reads.append(bytes(seq))
        base = [engines[MODES[0]].query_pml(s) for s in reads]
        for mode in MODES[1:]:
            got = [engines[mode].query_pml(s) for s in reads]
            assert got == base, (t_i, mode)


def test_fuzz_jax_engines_many_seeds():
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for seed in range(4):
        rng = np.random.default_rng(1000 + seed)
        text = rng.choice(bases, size=int(rng.integers(200, 2000))
                          ).astype(np.uint8)
        ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                             bound_ff=1)
        sc = ScalarEngine(ix)
        fe = FusedPMLEngine(build_fused_index(ix))
        ce = PMLEngine(build_device_index(ix))
        reads = []
        for i in range(10):
            L = int(rng.integers(1, 50))
            s = int(rng.integers(0, max(1, len(text) - L)))
            seq = bytearray(text[s : s + L].tobytes())
            for _ in range(int(rng.integers(0, 3))):
                seq[int(rng.integers(0, L))] = int(
                    rng.choice(np.frombuffer(b"ACGTNX", np.uint8)))
            reads.append((f"r{i}", bytes(seq)))
        batch = next(make_batches(reads, lanes=len(reads)))
        got_f = fe.query_batch(batch)
        got_c = ce.query_batch(batch)
        for i, (name, seq) in enumerate(reads):
            want = sc.query_pml(seq)
            assert got_f[i] == want, (seed, name)
            assert got_c[i] == want, (seed, name)


def test_fuzz_advanced_device_engines():
    """Random-seed fuzz of the MEM / k-mer-count / color device engines
    against their scalar oracles (multiple texts and read shapes)."""
    from movi_tpu.color import ColorEngine, DocumentInfo, build_color_table
    from movi_tpu.cpu_ref.advanced import AdvancedEngine
    from movi_tpu.engine.fused_color import (FusedColorEngine,
                                             build_fused_color_index)
    from movi_tpu.engine.fused_kmer import FusedKmerCountEngine
    from movi_tpu.engine.fused_mem import (FusedAllMemEngine,
                                           FusedMemEngine,
                                           build_fused_mem_index)
    from movi_tpu.engine.fused_search import build_fused_search_index

    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for seed in range(3):
        rng = np.random.default_rng(2000 + seed)
        fw = rng.choice(bases, size=2500)
        rc = np.array([comp[b] for b in fw[::-1]], dtype=np.uint8)
        text = np.concatenate([fw, rc])
        runs = build_bwt_runs(text)
        ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
        adv = AdvancedEngine(ix, ftab_k=0)
        mi = build_fused_mem_index(ix)
        si = build_fused_search_index(ix)
        di = DocumentInfo.create([2500, 5000])
        ct = build_color_table(ix, runs.sa, di)
        ci = build_fused_color_index(ix, ct)
        sc = ColorEngine(ix, ct)

        reads = []
        for i in range(12):
            L = int(rng.integers(15, 70))
            s = int(rng.integers(0, len(fw) - L))
            seq = fw[s : s + L].copy()
            seq = np.where(rng.random(L) < 0.08,
                           rng.choice(bases, size=L), seq)
            if i % 4 == 0:
                seq[rng.integers(0, L, size=2)] = ord("N")
            reads.append((f"f{i}", seq.tobytes()))

        for b in make_batches(reads, lanes=len(reads)):
            L_mem = int(rng.integers(2, 8))
            mems = FusedMemEngine(mi, L_mem).query_batch(b)
            allm = FusedAllMemEngine(mi).query_batch(b)
            k = int(rng.integers(4, 14))
            kc = FusedKmerCountEngine(si, k).query_batch(b)
            col = FusedColorEngine(ci, ct).query_batch(b)
            for i, nm in enumerate(b.names):
                seq = dict(reads)[nm]
                assert mems[i] == adv.query_mems(seq, L_mem), (seed, nm)
                assert allm[i] == adv.query_all_mems(seq), (seed, nm)
                assert kc[i] == adv.count_kmers_bidirectional(seq, k), \
                    (seed, nm, k)
                pmls, cell = sc.query_pml_multiclass(seq)
                assert col[i][0] == pmls and col[i][1] == cell, (seed, nm)


def test_fuzz_paired_engines():
    """Paired PML + paired color vs scalar over random and degenerate
    texts (the composed records exercise every descriptor kind)."""
    from movi_tpu.color import ColorEngine, DocumentInfo, build_color_table
    from movi_tpu.engine.fused2 import (Fused2ColorEngine, Fused2PMLEngine,
                                        build_fused2_color_index,
                                        build_fused2_index)

    rng = np.random.default_rng(777)
    for t_i, text in enumerate(_texts(rng)):
        runs = build_bwt_runs(text)
        ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
        sc = ScalarEngine(ix)
        fi = build_fused_index(ix)
        eng = Fused2PMLEngine(build_fused2_index(fi))
        half = max(1, len(text) // 2)
        di = DocumentInfo.create([half, len(text)])
        ct = build_color_table(ix, runs.sa, di)
        csc = ColorEngine(ix, ct)
        ceng = Fused2ColorEngine(build_fused2_color_index(fi, ct), ct)

        reads = []
        for i in range(10):
            L = int(rng.integers(1, 50))
            s = int(rng.integers(0, max(1, len(text) - L)))
            seq = bytearray(text[s : s + L].tobytes())
            if i % 3 == 0 and L > 2:
                seq[int(rng.integers(0, L))] = ord("N")
            reads.append((f"r{i}", bytes(seq)))
        batch = next(make_batches(reads, lanes=len(reads)))
        got = eng.query_batch(batch)
        gotc = ceng.query_batch(batch)
        for i, (name, seq) in enumerate(reads):
            assert got[i] == sc.query_pml(seq), (t_i, name)
            pmls, cell = csc.query_pml_multiclass(seq)
            assert gotc[i][0] == pmls and gotc[i][1] == cell, (t_i, name)
