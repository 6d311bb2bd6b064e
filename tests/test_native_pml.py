"""Native scalar PML loop (the measured CPU baseline) vs ScalarEngine."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.native_pml import native_pml_available, native_pml_checksum
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import build_move_index


@pytest.mark.skipif(not native_pml_available(),
                    reason="native library not built")
def test_native_pml_checksum_matches_scalar():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=4000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    sc = ScalarEngine(ix)

    L = 80
    starts = rng.integers(0, len(text) - L, size=40)
    reads = np.stack([text[s:s + L] for s in starts])
    err = rng.random(reads.shape) < 0.05
    reads = np.where(err, rng.choice(bases, size=reads.shape), reads)

    # map to alphabet slots in right-to-left processing order
    alphamap = np.full(256, ix.sigma, dtype=np.uint8)
    for a, ch in enumerate(ix.alphabet):
        alphamap[ch] = a
    reads_alpha = alphamap[reads[:, ::-1]]

    want = sum(sum(sc.query_pml(row.tobytes())) for row in reads)
    got = native_pml_checksum(ix, reads_alpha)
    assert got == want
