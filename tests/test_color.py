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


def test_reference_color_binaries_roundtrip(setup, tmp_path):
    """doc_pats.bin / doc_sets.bin / doc_sets_flat.bin reference binary
    interop (serialize_doc_pats/doc_sets + flat_and_serialize_colors_
    vectors, move_structure_io.cpp:513-641): write, reload through each
    path, identical tables."""
    import os

    docs, text, runs, ix, di, ct = setup
    d = str(tmp_path)
    ct.save_reference(d, flat=True)
    assert os.path.getsize(os.path.join(d, "doc_pats.bin")) == 2 * ix.length
    nsets = len(ct.unique_doc_sets)
    exp = 8 + sum(2 + 2 * len(s) for s in ct.unique_doc_sets) + 4 * ix.r
    assert os.path.getsize(os.path.join(d, "doc_sets.bin")) == exp
    flat_len = sum(1 + len(s) for s in ct.unique_doc_sets)
    assert os.path.getsize(os.path.join(d, "doc_sets_flat.bin")) == \
        8 + 2 * flat_len + 5 * ix.r

    back = ColorTable.load_reference(d, ix.r, di, length=ix.length)
    assert np.array_equal(back.doc_pats, ct.doc_pats)
    assert np.array_equal(back.doc_set_inds, ct.doc_set_inds)
    for a, b in zip(back.unique_doc_sets, ct.unique_doc_sets):
        assert np.array_equal(a, b)

    # flat path alone (reference default: no vector-of-vectors flag)
    os.remove(os.path.join(d, "doc_sets.bin"))
    back2 = ColorTable.load_reference(d, ix.r, di, length=ix.length)
    assert np.array_equal(back2.doc_set_inds, ct.doc_set_inds)
    for a, b in zip(back2.unique_doc_sets, ct.unique_doc_sets):
        assert np.array_equal(a, b)


def test_multiclass_from_reference_binaries(setup, tmp_path):
    """Multi-class query results are identical whether the color table
    came from colors.npz or the reference binaries."""
    docs, text, runs, ix, di, ct = setup
    d = str(tmp_path)
    ct.save_reference(d, flat=False)
    back = ColorTable.load_reference(d, ix.r, di, length=ix.length)
    e1 = ColorEngine(ix, ct)
    e2 = ColorEngine(ix, back)
    rng = np.random.default_rng(5)
    for _ in range(10):
        doc_i = int(rng.integers(0, len(docs)))
        s = int(rng.integers(0, len(docs[doc_i]) - 80))
        read = docs[doc_i][s:s + 80].tobytes()
        p1, c1 = e1.query_pml_multiclass(read)
        p2, c2 = e2.query_pml_multiclass(read)
        assert p1 == p2 and c1 == c2
