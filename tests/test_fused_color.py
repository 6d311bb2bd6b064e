"""Device Movi Color engine (engine/fused_color.py) vs the scalar
ColorEngine oracle (move_structure_query.cpp:373-470;
read_processor.cpp:122-186, 489-561)."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.color import (ColorEngine, DocumentInfo, build_color_table,
                            compress_color_table)
from movi_tpu.engine.fused_color import (FusedColorEngine,
                                         build_fused_color_index)
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    docs = [rng.choice(bases, size=2500) for _ in range(3)]
    docs[1][:1200] = docs[0][:1200]  # overlap -> multi-doc sets
    text = np.concatenate(docs)
    offs = np.cumsum([len(d) for d in docs]).astype(np.int64)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds", bound_ff=1)
    di = DocumentInfo.create(offs, taxon_ids=[101, 102, 202])
    ct = build_color_table(ix, runs.sa, di)

    reads = []
    for i in range(40):
        d = int(rng.integers(0, 3))
        L = int(rng.integers(60, 140))
        s = int(rng.integers(0, len(docs[d]) - L))
        seq = docs[d][s : s + L].copy()
        err = rng.random(L) < 0.02
        seq = np.where(err, rng.choice(bases, size=L), seq)
        if i % 7 == 0:
            seq[rng.integers(0, L, size=2)] = ord("N")
        reads.append((f"r{i}", seq.tobytes()))
    return ix, runs, ct, reads


def _compare(ix, ct, reads, **cfg):
    ci = build_fused_color_index(ix, ct)
    sc = ColorEngine(ix, ct, report_colors=True, **cfg)
    fe = FusedColorEngine(ci, ct, **cfg)
    got = {}
    for b in make_batches(reads, lanes=len(reads)):
        for nm, r in zip(b.names, fe.query_batch(b)):
            got[nm] = r
    for name, seq in reads:
        pmls, cell = sc.query_pml_multiclass(seq)
        gp, gc, gcol = got[name]
        assert gp == pmls, (name, "pml")
        assert gc == cell, (name, "cell", gc, cell)
        assert gcol == sc.last_colors, (name, "colors")


@pytest.mark.parametrize("cfg", [
    dict(),
    dict(min_match_len=3),
    dict(report_all=True),
    dict(report_all=True, min_diff_frac=0.5),
    dict(report_all=True, min_score_frac=0.1),
    dict(pvalue_scoring=True),
    dict(pvalue_scoring=True, report_all=True, min_score_frac=0.05),
])
def test_fused_color_matches_scalar(setup, cfg):
    ix, runs, ct, reads = setup
    _compare(ix, ct, reads, **cfg)


def test_fused_color_compressed(setup):
    ix, runs, ct, reads = setup
    ctc = compress_color_table(ct, take=3)
    _compare(ix, ctc, reads)
    _compare(ix, ctc, reads, report_all=True, min_score_frac=0.1)


def test_fused_color_early_stop(setup):
    """--early-stop lane retirement: the fused engine's truncation of
    the emitted streams is bit-equal to the scalar engine's loop break
    (read_processor.cpp:240-250) -- including truncated PML vectors,
    colors streams, and CSV cells."""
    ix, runs, ct, reads = setup
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", np.uint8)
    long_reads = []
    for i in range(6):
        # unclassified: pure random 260-350bp -> stops at p1 in {0, 100}
        L = int(rng.integers(260, 350))
        long_reads.append((f"u{i}", rng.choice(bases, size=L).tobytes()))
    # classified long reads: must NOT stop
    text_srcs = [seq for _, seq in reads[:4]]
    for i, s in enumerate(text_srcs):
        long_reads.append((f"c{i}", (s * 4)[:280]))
    _compare(ix, ct, long_reads, early_stop=True)
    # sanity: at least one read actually early-stopped (truncated pml)
    sc = ColorEngine(ix, ct, early_stop=True)
    trunc = 0
    for name, seq in long_reads:
        pmls, _ = sc.query_pml_multiclass(seq)
        if len(pmls) < len(seq):
            trunc += 1
    assert trunc >= 1


def test_fused2_color_matches_scalar(setup):
    """Paired-base Movi Color engine (engine/fused2.py): bit-equal to
    the scalar ColorEngine across the config matrix, incl. early-stop."""
    from movi_tpu.engine.fused import build_fused_index
    from movi_tpu.engine.fused2 import (Fused2ColorEngine,
                                        build_fused2_color_index)

    ix, runs, ct, reads = setup
    fi = build_fused_index(ix)
    ci2 = build_fused2_color_index(fi, ct)
    for cfg in (dict(), dict(min_match_len=3), dict(pvalue_scoring=True),
                dict(report_all=True, min_score_frac=0.1),
                dict(early_stop=True)):
        sc = ColorEngine(ix, ct, report_colors=True, **cfg)
        fe = Fused2ColorEngine(ci2, ct, **cfg)
        got = {}
        for b in make_batches(reads, lanes=len(reads)):
            for nm, r in zip(b.names, fe.query_batch(b)):
                got[nm] = r
        for name, seq in reads:
            pmls, cell = sc.query_pml_multiclass(seq)
            gp, gc, gcol = got[name]
            assert gp == pmls, (name, cfg, "pml")
            assert gc == cell, (name, cfg, "cell")
            assert gcol == sc.last_colors, (name, cfg, "colors")


def test_fused2_color_compressed(setup):
    from movi_tpu.engine.fused import build_fused_index
    from movi_tpu.engine.fused2 import (Fused2ColorEngine,
                                        build_fused2_color_index)

    ix, runs, ct, reads = setup
    ct2 = compress_color_table(ct, take=3)
    fi = build_fused_index(ix)
    ci2 = build_fused2_color_index(fi, ct2)
    sc = ColorEngine(ix, ct2)
    fe = Fused2ColorEngine(ci2, ct2)
    for b in make_batches(reads, lanes=len(reads)):
        for nm, (gp, gc, _), (name, seq) in zip(b.names, fe.query_batch(b),
                                                reads):
            pmls, cell = sc.query_pml_multiclass(seq)
            assert gp == pmls and gc == cell, name


def test_early_stop_chunk_retirement(setup):
    """Long reads that early-stop before the last scan chunk: the
    chunked device loop must stop issuing chunks (measured by
    last_scanned_rows) while keeping outputs bit-equal to the scalar
    break -- for both the one-step and the paired color engines."""
    from movi_tpu.engine.fused import build_fused_index
    from movi_tpu.engine.fused2 import (Fused2ColorEngine,
                                        build_fused2_color_index)

    ix, runs, ct, reads = setup
    rng = np.random.default_rng(123)
    bases = np.frombuffer(b"ACGT", np.uint8)
    # pure-random reads spanning >2 chunks: the stop rule fires just
    # past the midpoint, so the final chunk(s) must never be scanned
    L = 3 * 2048 + 512
    long_reads = [(f"u{i}", rng.choice(bases, size=L).tobytes())
                  for i in range(5)]
    sc = ColorEngine(ix, ct, report_colors=True, early_stop=True)

    ci = build_fused_color_index(ix, ct)
    fe = FusedColorEngine(ci, ct, early_stop=True)
    fe2 = Fused2ColorEngine(build_fused2_color_index(ci.fi, ct), ct,
                            early_stop=True)
    for eng in (fe, fe2):
        got = {}
        for b in make_batches(long_reads, lanes=len(long_reads)):
            for nm, r in zip(b.names, eng.query_batch(b)):
                got[nm] = r
        assert eng.last_scanned_rows < L, type(eng).__name__
        for name, seq in long_reads:
            pmls, cell = sc.query_pml_multiclass(seq)
            gp, gc, gcol = got[name]
            assert gp == pmls, (type(eng).__name__, name, "pml")
            assert gc == cell, (type(eng).__name__, name, "cell")
            assert gcol == sc.last_colors, (type(eng).__name__, name)
