"""Separator-index queries: fused/compact engines == scalar engine."""

import numpy as np
import pytest

from movi_tpu.build.prepare_ref import PreparedRef, revcomp
from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.constants import SEPARATOR
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.device_index import build_device_index
from movi_tpu.engine.fused import FusedPMLEngine, build_fused_index
from movi_tpu.engine.pml import PMLEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(91)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    docs = [rng.choice(bases, size=800).astype(np.uint8) for _ in range(3)]
    sep = np.array([SEPARATOR], dtype=np.uint8)
    pieces = []
    for d in docs:
        pieces.extend([d, sep, revcomp(d), sep])
    text = np.concatenate(pieces)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         separators=True, bound_ff=1)
    return docs, text, ix, ScalarEngine(ix)


def test_separators_lf_loop(setup):
    docs, text, ix, sc = setup
    assert ix.sigma == 5
    assert sc.verify_lf_loop()


def test_separators_fused_vs_scalar(setup):
    docs, text, ix, sc = setup
    rng = np.random.default_rng(93)
    reads = []
    for i in range(30):
        d = docs[i % 3]
        L = int(rng.integers(10, 60))
        s = int(rng.integers(0, len(d) - L))
        seq = d[s : s + L].copy()
        if i % 4 == 0:
            seq[int(rng.integers(0, L))] = ord("N")
        if i % 5 == 0:
            seq[int(rng.integers(0, L))] = SEPARATOR  # '%' in a read
        reads.append((f"r{i}", seq.tobytes()))
    batch = next(make_batches(reads, lanes=len(reads)))
    fused = FusedPMLEngine(build_fused_index(ix)).query_batch(batch)
    compact = PMLEngine(build_device_index(ix)).query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        want = sc.query_pml(seq)
        assert fused[i] == want, name
        assert compact[i] == want, name
