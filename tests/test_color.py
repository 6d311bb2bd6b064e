"""Movi Color: doc_pats/doc_sets construction and multi-class
classification, validated against brute force."""

import numpy as np
import pytest

from movi_tpu.build.prepare_ref import PreparedRef, revcomp
from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.color import (ColorEngine, ColorTable, DocumentInfo,
                            build_color_table, compress_color_table)
from movi_tpu.index.structure import build_move_index


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(41)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # three documents (fw+rc each, as prepare_ref emits)
    docs = [rng.choice(bases, size=1200).astype(np.uint8) for _ in range(3)]
    pieces = []
    doc_offsets = []
    running = 0
    for d in docs:
        pieces.extend([d, revcomp(d)])
        running += 2 * len(d)
        doc_offsets.append(running)
    text = np.concatenate(pieces)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    di = DocumentInfo.create(doc_offsets, taxon_ids=[101, 202, 303])
    ct = build_color_table(ix, runs.sa, di)
    return docs, text, runs, ix, di, ct


def test_doc_pats_match_bruteforce(setup):
    docs, text, runs, ix, di, ct = setup
    n = ix.length
    ends = di.doc_offsets
    for p in np.random.default_rng(1).integers(0, n, size=200):
        p = int(p)
        pos = int(runs.sa[p])
        d = int(np.minimum(np.searchsorted(ends, pos, side="right"),
                           di.num_docs - 1))
        assert ct.doc_pats[p] == di.doc_ids[d], p


def test_doc_sets_contents(setup):
    docs, text, runs, ix, di, ct = setup
    rng = np.random.default_rng(2)
    for i in rng.integers(0, ix.r, size=100):
        i = int(i)
        lo, hi = int(ix.all_p[i]), int(ix.all_p[i + 1])
        want = np.unique(ct.doc_pats[lo:hi])
        got = ct.unique_doc_sets[int(ct.doc_set_inds[i])]
        assert np.array_equal(got, want), i


def test_compression_keeps_frequent(setup):
    docs, text, runs, ix, di, ct = setup
    take = max(2, len(ct.unique_doc_sets) // 2)
    cct = compress_color_table(ct, take=take)
    assert len(cct.unique_doc_sets) == take
    # most runs still resolve
    resolved = np.sum(cct.doc_set_inds < take)
    assert resolved > 0.5 * ix.r


def test_multiclass_classification(setup):
    docs, text, runs, ix, di, ct = setup
    eng = ColorEngine(ix, ct, min_match_len=0)
    rng = np.random.default_rng(3)
    correct = 0
    trials = 12
    for t in range(trials):
        d = t % 3
        L = 120
        s = int(rng.integers(0, len(docs[d]) - L))
        read = docs[d][s : s + L].tobytes()
        pmls, cell = eng.query_pml_multiclass(read)
        primary = int(cell.split(",")[0])
        if primary == [101, 202, 303][d]:
            correct += 1
    assert correct >= trials - 2, correct


def test_color_table_roundtrip(setup, tmp_path):
    docs, text, runs, ix, di, ct = setup
    p = str(tmp_path / "colors.npz")
    ct.save(p)
    ct2 = ColorTable.load(p)
    assert np.array_equal(ct2.doc_pats, ct.doc_pats)
    assert np.array_equal(ct2.doc_set_inds, ct.doc_set_inds)
    assert len(ct2.unique_doc_sets) == len(ct.unique_doc_sets)
    for a, b in zip(ct2.unique_doc_sets, ct.unique_doc_sets):
        assert np.array_equal(a, b)
    assert np.array_equal(ct2.doc_info.to_taxon_id, di.to_taxon_id)
