"""Multi-ftab fallback chain must not change query results."""

import numpy as np
import pytest

from movi_tpu.build.prepare_ref import revcomp
from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.advanced import AdvancedEngine
from movi_tpu.index.structure import build_move_index


def test_multi_ftab_mems_equal():
    rng = np.random.default_rng(71)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fw = rng.choice(bases, size=2500).astype(np.uint8)
    text = np.concatenate([fw, revcomp(fw)])
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds")
    plain = AdvancedEngine(ix, ftab_k=0)
    multi = AdvancedEngine(ix, ftab_k=6, multi_ftab=True)
    for t in range(8):
        L1, L2 = int(rng.integers(10, 25)), int(rng.integers(10, 25))
        s1 = int(rng.integers(0, len(text) - L1))
        s2 = int(rng.integers(0, len(text) - L2))
        read = text[s1 : s1 + L1].tobytes() + text[s2 : s2 + L2].tobytes()
        assert multi.query_all_mems(read) == plain.query_all_mems(read), t


def test_multi_ftab_kmers_equal():
    rng = np.random.default_rng(73)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fw = rng.choice(bases, size=2500).astype(np.uint8)
    text = np.concatenate([fw, revcomp(fw)])
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds")
    plain = AdvancedEngine(ix, ftab_k=0)
    multi = AdvancedEngine(ix, ftab_k=4, multi_ftab=True)
    k = 11
    for t in range(5):
        L = int(rng.integers(30, 70))
        s = int(rng.integers(0, len(text) - L))
        read = bytearray(text[s : s + L].tobytes())
        for _ in range(2):
            read[int(rng.integers(0, L))] = int(
                rng.choice(np.frombuffer(b"ACGT", np.uint8)))
        read = bytes(read)
        got_m = sum(c for _, c in multi.query_all_kmers(read, k))
        got_p = sum(c for _, c in plain.query_all_kmers(read, k))
        assert got_m == got_p, t
