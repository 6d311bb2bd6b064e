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


@pytest.fixture(scope="module")
def search_setup():
    rng = np.random.default_rng(61)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    from movi_tpu.engine.fused_search import build_fused_search_index

    return rng, text, ix, build_fused_search_index(ix)


def _search_alphas(rng, text, si, lanes, W):
    alphas = np.full((lanes, W), -2, dtype=np.int32)
    reads = []
    for i in range(lanes):
        L = int(rng.integers(10, W))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        if i % 3 == 0:
            seq[int(rng.integers(0, L))] = ord("N")
        reads.append(bytes(seq.tobytes()))
        alphas[i, :L] = si.alphamap_query[seq][::-1]
    return reads, alphas


def test_sharded_count_zml_match_unsharded(search_setup):
    """Model-sharded count/ZML == the unsharded fused engines == the
    scalar oracle."""
    from movi_tpu.engine.fused_search import (fused_count_scan,
                                              fused_zml_scan)
    from movi_tpu.parallel.sharded_index import (sharded_fused_count,
                                                 sharded_fused_zml)

    rng, text, ix, si = search_setup
    assert len(jax.devices()) >= 8
    mesh = make_2d_mesh(data=2, model=4)
    sc = ScalarEngine(ix)
    reads, alphas = _search_alphas(rng, text, si, lanes=16, W=40)

    m_s, c_s = (np.asarray(x) for x in
                sharded_fused_count(mesh, si, alphas.T))
    import jax.numpy as jnp

    m_u, c_u = (np.asarray(x) for x in
                fused_count_scan(si, jnp.asarray(alphas.T)))
    assert (m_s == m_u).all() and (c_s == c_u).all()
    for i, seq in enumerate(reads):
        pos, cnt = sc.query_count(seq)
        assert (len(seq) - int(m_s[i]), int(c_s[i])) == (pos, cnt), i

    z_s = np.asarray(sharded_fused_zml(mesh, si, alphas.T))
    z_u = np.asarray(fused_zml_scan(si, jnp.asarray(alphas.T)))
    assert (z_s == z_u).all()
    for i, seq in enumerate(reads):
        assert z_s[: len(seq), i].tolist() == sc.query_zml(seq), i


def test_pick_backend_ladder(monkeypatch):
    """Capacity ladder: paired -> one-step -> sharded -> compact as the
    (shrunk) HBM budget runs out."""
    from movi_tpu.engine.select import pick_backend

    r, sigma = 1_000_000, 4
    # paired PML table = 400 B/run = 400 MB; one-step = 40 MB
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(2_000_000_000))
    assert pick_backend(r, sigma, "pml") == "paired"
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(200_000_000))
    assert pick_backend(r, sigma, "pml") == "one-step"
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(50_000_000))
    assert pick_backend(r, sigma, "pml") == "compact"
    assert pick_backend(r, sigma, "pml", model_shards=4) == "sharded"
    # search ladder: one-step = 128 MB, paired = 768 MB
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(4_000_000_000))
    assert pick_backend(r, sigma, "search") == "paired"
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(500_000_000))
    assert pick_backend(r, sigma, "search") == "one-step"
    monkeypatch.setenv("MOVI_TPU_HBM_BYTES", str(100_000_000))
    assert pick_backend(r, sigma, "search") == "compact"
    assert pick_backend(r, sigma, "search", model_shards=8) == "sharded"
