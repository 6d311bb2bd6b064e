"""Sampled SA entries: get_SA_entry must equal the true suffix array."""

import numpy as np

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import build_move_index


def test_sa_entries_match_true_sa():
    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=4000).astype(np.uint8)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    ix.sampled_SA = runs.sampled_sa(rate=16)
    ix.sa_sample_rate = 16
    eng = ScalarEngine(ix)
    n = ix.length
    for p in rng.integers(0, n, size=50):
        p = int(p)
        idx = int(np.searchsorted(ix.all_p[:-1], p, side="right")) - 1
        off = p - int(ix.all_p[idx])
        assert eng.get_SA_entry(idx, off) == int(runs.sa[p]), p


def test_sa_entries_with_pml():
    rng = np.random.default_rng(29)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=4000).astype(np.uint8)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    ix.sampled_SA = runs.sampled_sa(rate=32)
    ix.sa_sample_rate = 32
    eng = ScalarEngine(ix)
    read = text[100:160].tobytes()
    pmls, sa_entries = eng.query_pml(read, collect_sa=True)
    assert len(pmls) == len(sa_entries) == len(read)
    # every SA entry is a valid text position
    assert all(0 <= s < ix.length for s in sa_entries)
