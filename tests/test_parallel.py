"""Sharded engine on an 8-device CPU mesh: results must equal the scalar
engine + scalar classifier."""

import numpy as np
import pytest

import jax

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.classify import Classifier, EmpNullDatabase
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused import build_fused_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.parallel.mesh import ShardedPMLEngine, make_mesh


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=6000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         bound_ff=1)
    return text, ix, ScalarEngine(ix), build_fused_index(ix)


def test_sharded_pml_and_classify(setup):
    text, ix, scalar, fi = setup
    assert len(jax.devices()) >= 8, "needs the 8-device CPU mesh"
    mesh = make_mesh(8)

    rng = np.random.default_rng(37)
    lanes, Wmax = 32, 64
    seqs = np.full((lanes, Wmax), 255, dtype=np.uint8)
    lengths = np.zeros(lanes, dtype=np.int32)
    reads = []
    for i in range(lanes):
        L = int(rng.integers(8, Wmax))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        pos = rng.integers(0, L, size=max(1, L // 6))
        seq[pos] = rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                              size=len(pos))
        seqs[i, Wmax - L :] = seq
        lengths[i] = L
        reads.append(bytes(seq.tobytes()))

    db = EmpNullDatabase()
    db.compute([1, 1, 1, 1, 1, 2, 2, 2, 2, 2])
    cl = Classifier(db, bin_width=16)

    eng = ShardedPMLEngine(fi, mesh=mesh, bin_width=16,
                           max_value_thr=cl.max_value_thr)
    ml, found, above, below = eng.query_batch_device(seqs, lengths)
    ml = np.asarray(ml)
    found = np.asarray(found)
    above = np.asarray(above)
    below = np.asarray(below)

    for i, seq in enumerate(reads):
        L = lengths[i]
        want_pml = scalar.query_pml(seq)
        assert ml[:L, i].tolist() == want_pml, i
        w_found, _, w_above, w_below = cl.classify(want_pml)
        assert (found[i], above[i], below[i]) == (w_found, w_above, w_below), i

    # output is genuinely sharded over the mesh
    assert len(ml.shape) == 2


def test_mesh_sharding_spec(setup):
    text, ix, scalar, fi = setup
    mesh = make_mesh(8)
    eng = ShardedPMLEngine(fi, mesh=mesh)
    seqs = np.full((16, 32), 255, dtype=np.uint8)
    seqs[:, -10:] = ord("A")
    lengths = np.full(16, 10, dtype=np.int32)
    ml, found, above, below = eng.query_batch_device(seqs, lengths)
    assert "data" in str(found.sharding.spec)


def test_sharded_search_and_color(setup):
    """ShardedSearchEngine / ShardedColorEngine over the 8-device mesh
    equal the scalar count/ZML/multiclass results."""
    from movi_tpu.color import ColorEngine, DocumentInfo, build_color_table
    from movi_tpu.engine.fused_color import build_fused_color_index
    from movi_tpu.engine.fused_search import build_fused_search_index
    from movi_tpu.parallel.mesh import (ShardedColorEngine,
                                        ShardedSearchEngine)

    text, ix, scalar, fi = setup
    mesh = make_mesh(8)
    rng = np.random.default_rng(41)
    lanes, Wmax = 32, 64
    seqs = np.full((lanes, Wmax), 255, dtype=np.uint8)
    lengths = np.zeros(lanes, dtype=np.int32)
    reads = []
    for i in range(lanes):
        L = int(rng.integers(8, Wmax))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seqs[i, Wmax - L:] = seq
        lengths[i] = L
        reads.append(seq.tobytes())

    se = ShardedSearchEngine(build_fused_search_index(ix), mesh=mesh)
    matched, count = (np.asarray(x)
                      for x in se.count_batch_device(seqs, lengths))
    zml = np.asarray(se.zml_batch_device(seqs, lengths))
    for i, seq in enumerate(reads):
        pos, cnt = scalar.query_count(seq)
        assert int(lengths[i]) - int(matched[i]) == pos, i
        assert int(count[i]) == cnt, i
        assert zml[: len(seq), i].tolist() == scalar.query_zml(seq), i

    runs = build_bwt_runs(text)
    di = DocumentInfo.create([3000, 6000])
    ct = build_color_table(ix, runs.sa, di)
    ce = ShardedColorEngine(build_fused_color_index(ix, ct, fi=fi),
                            mesh=mesh)
    cml, ccol = (np.asarray(x) for x in ce.query_batch_device(seqs))
    sc = ColorEngine(ix, ct)
    from movi_tpu.engine.fused_color import FusedColorEngine
    fe = FusedColorEngine(build_fused_color_index(ix, ct, fi=fi), ct)
    for i, seq in enumerate(reads):
        L = len(seq)
        pmls, cell = sc.query_pml_multiclass(seq)
        assert cml[:L, i].tolist() == pmls, i
        got_cell, _ = fe._tally(cml[:L, i], ccol[:L, i], L)
        assert got_cell == cell, i


def test_sharded_pml_paired(setup):
    """paired=True runs the two-base-per-gather scan over the same mesh
    with identical PMLs and classification."""
    text, ix, scalar, fi = setup
    mesh = make_mesh(8)
    rng = np.random.default_rng(41)
    lanes, Wmax = 32, 63   # odd width exercises the pair tail pad
    seqs = np.full((lanes, Wmax), 255, dtype=np.uint8)
    lengths = np.zeros(lanes, dtype=np.int32)
    reads = []
    for i in range(lanes):
        L = int(rng.integers(8, Wmax))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        seqs[i, Wmax - L:] = seq
        lengths[i] = L
        reads.append(bytes(seq.tobytes()))

    db = EmpNullDatabase()
    db.compute([1, 1, 1, 1, 1, 2, 2, 2, 2, 2])
    cl = Classifier(db, bin_width=16)
    eng = ShardedPMLEngine(fi, mesh=mesh, bin_width=16,
                           max_value_thr=cl.max_value_thr, paired=True)
    ml, found, above, below = eng.query_batch_device(seqs, lengths)
    ml, found = np.asarray(ml), np.asarray(found)
    above, below = np.asarray(above), np.asarray(below)
    for i, seq in enumerate(reads):
        L = lengths[i]
        want_pml = scalar.query_pml(seq)
        assert ml[:L, i].tolist() == want_pml, i
        w_found, _, w_above, w_below = cl.classify(want_pml)
        assert (found[i], above[i], below[i]) == (w_found, w_above,
                                                  w_below), i


def test_sharded_kmer_and_mem(setup):
    """ShardedKmerEngine / ShardedMemEngine over the 8-device mesh equal
    the unsharded fused engines (and thus the scalar oracles those are
    tested against)."""
    text, ix, scalar, fi = setup
    from movi_tpu.engine.fused_kmer import FusedKmerCountEngine
    from movi_tpu.engine.fused_mem import (FusedAllMemEngine,
                                           FusedMemEngine,
                                           build_fused_mem_index)
    from movi_tpu.engine.fused_search import build_fused_search_index
    from movi_tpu.io.fastx import make_batches
    from movi_tpu.parallel.mesh import (ShardedKmerEngine,
                                        ShardedMemEngine, make_mesh)

    mesh = make_mesh(8)
    rng = np.random.default_rng(41)
    lanes, Wmax, k = 16, 48, 8
    reads = []
    for i in range(lanes):
        L = int(rng.integers(k + 2, Wmax))
        s = int(rng.integers(0, len(text) - L))
        reads.append((f"r{i}", text[s:s + L].tobytes()))
    batch = next(make_batches(reads, lanes=lanes))

    si = build_fused_search_index(ix)
    want = FusedKmerCountEngine(si, k).query_batch(batch)
    # sharded: one lane per window, padded to the mesh size
    amap = si.alphamap_query
    wins, owners = [], []
    for i in range(lanes):
        L = int(batch.lengths[i])
        a = amap[np.frombuffer(
            batch.seqs[i, batch.width - L:].tobytes(), np.uint8)]
        w = np.lib.stride_tricks.sliding_window_view(a, k)
        wins.append(w)
        owners.append(np.full(len(w), i))
    wins = np.concatenate(wins).T.astype(np.int32)
    owners = np.concatenate(owners)
    pad = (-wins.shape[1]) % 8
    if pad:
        wins = np.concatenate([wins, np.full((k, pad), -1, np.int32)],
                              axis=1)
    ke = ShardedKmerEngine(si, k, mesh=mesh)
    found, cnt = ke.count_windows_device(wins)
    found = np.asarray(found)[: len(owners)]
    cnt = np.asarray(cnt)[: len(owners)]
    f = np.zeros(lanes, dtype=np.int64)
    t = np.zeros(lanes, dtype=np.int64)
    np.add.at(f, owners, found.astype(np.int64))
    np.add.at(t, owners, cnt.astype(np.int64))
    assert [(int(f[i]), int(t[i])) for i in range(lanes)] == want

    # MEMs: both the min-length machine and all-MEMs
    mi = build_fused_mem_index(ix)
    for L_min, ref_eng in ((10, FusedMemEngine(mi, 10)),
                           (0, FusedAllMemEngine(mi))):
        want_mem = ref_eng.query_batch(batch)
        me = ShardedMemEngine(mi, min_mem_length=L_min, mesh=mesh)
        state = me.query_batch_device(batch.seqs, batch.lengths)
        ends = np.asarray(state["ends"])
        counts = np.asarray(state["counts"])
        got = []
        for i in range(lanes):
            nz = np.flatnonzero(ends[i])
            got.append([(int(p), int(ends[i][p]), int(counts[i][p]))
                        for p in nz])
        assert got == want_mem, L_min


def test_sharded_search_paired(setup):
    """Paired search records over the mesh equal the one-step mesh
    engine (count and ZML)."""
    text, ix, scalar, fi = setup
    from movi_tpu.engine.fused_search import build_fused_search_index
    from movi_tpu.engine.fused_search2 import build_fused_search2_index
    from movi_tpu.parallel.mesh import ShardedSearchEngine, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(43)
    lanes, Wmax = 16, 40
    seqs = np.full((lanes, Wmax), 255, dtype=np.uint8)
    lengths = np.zeros(lanes, dtype=np.int32)
    for i in range(lanes):
        L = int(rng.integers(5, Wmax))
        s = int(rng.integers(0, len(text) - L))
        seqs[i, Wmax - L:] = text[s:s + L]
        lengths[i] = L

    se1 = ShardedSearchEngine(build_fused_search_index(ix), mesh=mesh)
    se2 = ShardedSearchEngine(build_fused_search2_index(ix), mesh=mesh,
                              paired=True)
    m1, c1 = se1.count_batch_device(seqs, lengths)
    m2, c2 = se2.count_batch_device(seqs, lengths)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    z1 = se1.zml_batch_device(seqs, lengths)
    z2 = se2.zml_batch_device(seqs, lengths)
    assert np.array_equal(np.asarray(z1), np.asarray(z2))
