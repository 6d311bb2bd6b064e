"""Index-sharded engine: record table split over a 'model' mesh axis must
produce the same PMLs as the scalar engine."""

import numpy as np
import pytest

import jax

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused import build_fused_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.parallel.sharded_index import make_2d_mesh, sharded_fused_pml


def test_sharded_index_pml():
    assert len(jax.devices()) >= 8
    mesh = make_2d_mesh(data=2, model=4)

    rng = np.random.default_rng(53)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         bound_ff=1)
    sc = ScalarEngine(ix)
    fi = build_fused_index(ix)

    lanes, W = 16, 40
    reads = []
    alphas = np.full((lanes, W), fi.sigma, dtype=np.int32)
    for i in range(lanes):
        L = int(rng.integers(10, W))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        if i % 3 == 0:
            seq[int(rng.integers(0, L))] = ord("N")
        reads.append((bytes(seq.tobytes()), L))
        a = fi.alphamap_query[seq][::-1]
        alphas[i, :L] = a
    ml = np.asarray(sharded_fused_pml(mesh, fi, alphas.T))
    for i, (seq, L) in enumerate(reads):
        assert ml[:L, i].tolist() == sc.query_pml(seq), i
