"""LCA post-processing and tree-compressed colors."""

import numpy as np
import pytest

from movi_tpu.build.prepare_ref import revcomp
from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.color import DocumentInfo, build_color_table
from movi_tpu.index.structure import build_move_index
from movi_tpu.lca import (build_doc_set_similarities, find_lca,
                          lca_postprocess, tree_compress_color_table)


def test_find_lca():
    #      1
    #     / \
    #    2   3
    #   / \   \
    #  4   5   6
    parent = {2: 1, 3: 1, 4: 2, 5: 2, 6: 3}
    assert find_lca(4, 5, parent) == 2
    assert find_lca(4, 6, parent) == 1
    assert find_lca(4, 0, parent) == 4     # undefined secondary
    assert find_lca(5, 5, parent) == 5
    assert find_lca(4, 2, parent) == 2     # ancestor case


def test_lca_postprocess():
    parent = {2: 1, 3: 1, 4: 2, 5: 2}
    rows = ["read1,4,5", "read2,4,0", "read3,4,3"]
    out = lca_postprocess(rows, parent)
    assert out == ["read1,4,5,2", "read2,4,0,4", "read3,4,3,1"]


@pytest.fixture(scope="module")
def color_setup():
    rng = np.random.default_rng(61)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base_doc = rng.choice(bases, size=900).astype(np.uint8)
    docs = []
    for i in range(4):
        d = base_doc.copy()
        # docs 0,1 similar; docs 2,3 similar but distinct group
        if i >= 2:
            d = rng.choice(bases, size=900).astype(np.uint8)
            if i == 3:
                d = docs[2][1].copy()
                mut = rng.integers(0, 900, size=30)
                d[mut] = rng.choice(bases, size=30)
        elif i == 1:
            mut = rng.integers(0, 900, size=30)
            d[mut] = rng.choice(bases, size=30)
        docs.append((i, d))
    pieces, offsets, run = [], [], 0
    for _, d in docs:
        pieces.extend([d, revcomp(d)])
        run += 2 * len(d)
        offsets.append(run)
    text = np.concatenate(pieces)
    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    di = DocumentInfo.create(offsets)
    ct = build_color_table(ix, runs.sa, di)
    return ix, ct


def test_similarities_structure(color_setup):
    ix, ct = color_setup
    sim = build_doc_set_similarities(ct)
    # similar pairs share far more runs than dissimilar pairs
    assert sim[0, 1] > sim[0, 2]
    assert sim[2, 3] > sim[0, 3]


def test_tree_compression(color_setup):
    ix, ct = color_setup
    tct = tree_compress_color_table(ct, ix.r)
    # 2*num-1 cluster nodes
    assert len(tct.unique_doc_sets) == 2 * ct.doc_info.num_species - 1
    # every run resolves, and singleton sets stay singletons
    assert tct.doc_set_inds.max() < len(tct.unique_doc_sets)
    for i, docs in enumerate(ct.unique_doc_sets):
        node = int(tct.doc_set_inds[np.flatnonzero(ct.doc_set_inds == i)[0]])
        members = set(int(x) for x in tct.unique_doc_sets[node])
        assert set(int(d) for d in docs) <= members
