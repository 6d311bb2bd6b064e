"""Vectorized batch-prep helpers: left_aligned_slots and
batch_kmer_windows edge cases (these replaced per-lane Python loops;
the loops were the reference behavior)."""

import numpy as np

from movi_tpu.io.fastx import ReadBatch, left_aligned_slots, make_batches


def _amap():
    amap = np.full(256, -1, dtype=np.int32)
    for a, ch in enumerate(b"ACGT"):
        amap[ch] = a
    return amap


def test_left_aligned_slots_matches_loop():
    reads = [("a", b"ACGTN"), ("b", b""), ("c", b"T"), ("d", b"NNNN"),
             ("e", b"GATTACA")]
    batch = next(make_batches(reads, lanes=len(reads)))
    amap = _amap()
    got = left_aligned_slots(batch, amap, fill=-2)
    W = batch.width
    want = np.full((len(reads), W), -2, np.int32)
    for i, (_, s) in enumerate(reads):
        L = len(s)
        if L:
            want[i, :L] = amap[np.frombuffer(s, np.uint8)]
    assert np.array_equal(got, want)


def test_batch_kmer_windows_edges():
    from movi_tpu.engine.fused_kmer import batch_kmer_windows

    amap = _amap()
    # every read shorter than k
    batch = next(make_batches([("a", b"ACG"), ("b", b"T")], lanes=2))
    al, own = batch_kmer_windows(batch, amap, k=5)
    assert al is None and own is None

    # mixed lengths: only long-enough reads contribute, in lane order
    reads = [("a", b"ACGTAC"), ("b", b"AC"), ("c", b"TTTTT")]
    batch = next(make_batches(reads, lanes=3))
    al, own = batch_kmer_windows(batch, amap, k=4)
    assert al.shape[0] == 4
    assert own.tolist() == [0, 0, 0, 2, 2]
    # first window of lane 0 is ACGT = [0,1,2,3]
    assert al[:, 0].tolist() == [0, 1, 2, 3]
    # N-containing windows keep the illegal slot
    batch = next(make_batches([("n", b"ANGT")], lanes=1))
    al, own = batch_kmer_windows(batch, amap, k=4)
    assert al[1, 0] == -1
