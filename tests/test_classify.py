"""Classification pipeline: null statistics + SPUMONI binary classify,
checked against the reference's filtered golden output."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REF_DATA, requires_ref_data

from movi_tpu.classify import (Classifier, EmpNullDatabase, build_nulldb_pml,
                               generate_null_reads)
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.build.prepare_ref import iter_fasta
from movi_tpu.io.fastx import iter_fastx


def test_nulldb_roundtrip(tmp_path):
    db = EmpNullDatabase()
    db.compute([0, 1, 1, 1, 1, 1, 2, 5, 5, 5, 5, 5, 9])
    assert db.percentile_value == 5
    p = str(tmp_path / "x.nulldb")
    db.save(p)
    db2 = EmpNullDatabase.load(p)
    assert db2.percentile_value == 5
    assert np.array_equal(db2.null_stats, db.null_stats)


def test_classifier_bins():
    db = EmpNullDatabase()
    db.compute([1] * 10)
    c = Classifier(db, bin_width=5)
    # max_value_thr = max(1, 3)+1 = 4
    assert c.max_value_thr == 4
    # 12 values -> bins [0:5], [5:12] (tail merges: 12-10 < 5)
    maxima = c.bins([0, 1, 2, 3, 9, 0, 0, 5, 0, 0, 0, 1])
    assert maxima == [9, 5]
    found, avg, above, below = c.classify([0, 1, 2, 3, 9, 0, 0, 5, 0, 0, 0, 1])
    assert (above, below) == (2, 0)
    assert found


@requires_ref_data
def test_filter_invert_golden(bwt_runs, index_regular_thr, tmp_path):
    """--pml --classify --filter --invert output equals the reference's
    sample.fasta.pmls.filtered_notfound.sorted golden."""
    eng = ScalarEngine(index_regular_thr)
    records = list(iter_fasta(os.path.join(REF_DATA, "ref.fasta")))
    db = build_nulldb_pml(index_regular_thr, eng.query_pml, records, seed=0)
    cl = Classifier(db)
    lines = []
    for name, seq in iter_fastx(os.path.join(REF_DATA, "sample.fasta")):
        found, *_ = cl.classify(eng.query_pml(seq))
        if not found:  # invert: echo NOT_PRESENT reads
            lines.append(">" + name)
            lines.append(seq.decode())
    got = sorted(lines, key=str.encode)
    with open(os.path.join(REF_DATA,
                           "sample.fasta.pmls.filtered_notfound.sorted")) as f:
        want = f.read().splitlines()
    assert got == want


@requires_ref_data
def test_null_reads_shape():
    records = list(iter_fasta(os.path.join(REF_DATA, "ref.fasta")))
    nulls = generate_null_reads(records, np.random.default_rng(0))
    assert len(nulls) > 0
    assert all(len(s) == 150 for _, s in nulls)
