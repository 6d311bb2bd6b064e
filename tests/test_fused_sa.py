"""Device SA-entries engine (engine/fused_sa.py) vs the scalar oracle
(get_SA_entries, move_structure.cpp:35-48)."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused import build_fused_index
from movi_tpu.engine.fused_sa import FusedSAEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.mark.parametrize("rate", [100, 37])
def test_fused_sa_entries_match_scalar(rate):
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", np.uint8)
    text = rng.choice(bases, size=5000)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
    ix.sampled_SA = runs.sampled_sa(rate)
    ix.sa_sample_rate = rate
    eng = ScalarEngine(ix)
    fe = FusedSAEngine(build_fused_index(ix), ix)
    reads = []
    for i in range(25):
        L = int(rng.integers(30, 100))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seq = np.where(rng.random(L) < 0.03, rng.choice(bases, size=L), seq)
        if i % 6 == 0:
            seq[rng.integers(0, L, size=2)] = ord("N")
        reads.append((f"r{i}", seq.tobytes()))
    got = {}
    for b in make_batches(reads, lanes=25):
        for nm, r in zip(b.names, fe.query_batch(b)):
            got[nm] = r
    for name, seq in reads:
        pmls, sas = eng.query_pml(seq, collect_sa=True)
        assert got[name] == (pmls, sas), name
