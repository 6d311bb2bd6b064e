"""Paired-base PML engine (engine/fused2.py): bit-exact vs scalar."""

import numpy as np
import pytest

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused import build_fused_index
from movi_tpu.engine.fused2 import Fused2PMLEngine, build_fused2_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import make_batches


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(47)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=5000).astype(np.uint8)
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                         bound_ff=1)
    fi = build_fused_index(ix)
    return text, ix, ScalarEngine(ix), Fused2PMLEngine(build_fused2_index(fi))


def _reads(rng, text, count=60):
    reads = []
    for i in range(count):
        L = int(rng.integers(3, 70))
        s = int(rng.integers(0, len(text) - L))
        seq = text[s : s + L].copy()
        if rng.random() < 0.6:
            pos = rng.integers(0, L, size=max(1, L // 8))
            seq[pos] = rng.choice(np.frombuffer(b"ACGTN", np.uint8),
                                  size=len(pos))
        reads.append((f"r{i}", seq.tobytes()))
    return reads


def test_fused2_pml(setup):
    text, ix, sc, eng = setup
    reads = _reads(np.random.default_rng(1), text)
    batch = next(make_batches(reads, lanes=len(reads)))
    got = eng.query_batch(batch)
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_pml(seq), name


def test_fused2_odd_and_long(setup):
    """Odd read lengths (tail pad) and reads crossing the carried-chunk
    boundary."""
    text, ix, sc, eng = setup
    rng = np.random.default_rng(9)
    reads = []
    for i, L in enumerate([1, 2, 3, 2047, 2048, 2049, 4097]):
        L = min(L, len(text) - 1)
        s = int(rng.integers(0, len(text) - L))
        seq = np.tile(text[s : s + L], 2)[:L]
        reads.append((f"L{i}", seq.tobytes()))
    batch = next(make_batches(reads, lanes=len(reads)))
    old_chunk = Fused2PMLEngine.CHUNK
    Fused2PMLEngine.CHUNK = 512
    try:
        got = eng.query_batch(batch)
    finally:
        Fused2PMLEngine.CHUNK = old_chunk
    for i, (name, seq) in enumerate(reads):
        assert got[i] == sc.query_pml(seq), name


def test_fused2_pml_golden(setup):
    import os
    from conftest import REF_DATA, requires_ref_data
    from movi_tpu.build.prepare_ref import prepare_ref
    from movi_tpu.io.fastx import iter_fastx
    from movi_tpu.io.outputs import pml_stdout_lines

    golden = os.path.join(REF_DATA, "sample.fastq.pmls.sorted")
    if not os.path.exists(golden):
        pytest.skip("reference tests_data not mounted")
    ref = prepare_ref(os.path.join(REF_DATA, "ref.fasta"))
    ix = build_move_index(build_bwt_runs(ref.text), "regular-thresholds",
                         bound_ff=1)
    eng = Fused2PMLEngine(build_fused2_index(build_fused_index(ix)))
    reads = list(iter_fastx(os.path.join(REF_DATA, "sample.fastq")))
    lines = []
    for batch in make_batches(reads, lanes=64):
        out = eng.query_batch(batch)
        for name, pmls in zip(batch.names, out):
            lines.extend(pml_stdout_lines(name, pmls))
    got = sorted(lines, key=str.encode)
    with open(golden) as f:
        want = f.read().splitlines()
    assert got == want


def test_w0_packs_25_bit_run_ids():
    """The w0 A-field extension (9 high bits, reaching the sign bit):
    synthetic records with run ids past 2^24 must decode exactly."""
    import jax.numpy as jnp

    from movi_tpu.engine.fused2 import (KIND_CONST, MAX_RUNS, _BIAS,
                                        _fused2_decode)

    for A_lo, A_hi in [(0x1ABCDEF, 0x1FFFFFF), (0, MAX_RUNS - 1),
                       (0xFFFFFF, 0x1000000)]:
        T1 = 5
        w0 = ((T1 + _BIAS) | (1 << 13)
              | ((A_lo >> 16) << 14) | ((A_hi >> 16) << 23))
        w0 = np.int64(w0).astype(np.int32)  # bit 31 wraps to sign
        C_lo, C_hi = 7, 9
        w1 = (0 + _BIAS) | (C_lo << 13) | (KIND_CONST << 25)
        w2 = (0 + _BIAS) | (C_hi << 13) | (KIND_CONST << 25)
        w3 = np.int64((A_lo & 0xFFFF) | ((A_hi & 0xFFFF) << 16)
                      ).astype(np.int32)
        rec = jnp.asarray(np.array([[w0, w1, w2, w3]], dtype=np.int32))
        # offset below T1 -> lo branch; at/above T1 -> hi branch
        for off, want_A, want_C in [(T1 - 1, A_lo, C_lo),
                                    (T1, A_hi, C_hi)]:
            idx, o, *_ = _fused2_decode(rec, jnp.asarray([off]), (0, 0))
            assert int(idx[0]) == want_A
            assert int(o[0]) == want_C


def test_chunked_compose_matches_single_shot(setup):
    """The run-chunked donating compose (which bounds peak memory at
    table + O(chunk) so the 2^25-run envelope is reachable on a 16 GB
    chip) writes the identical table as a one-shot compose, including
    the overlapping-tail re-compose and the 8-word color variant."""
    import jax.numpy as jnp

    from movi_tpu.engine.fused2 import compose_records

    text, ix, sc, eng = setup
    fi = build_fused_index(ix)
    r, slots = fi.r, fi.sigma + 1
    one, b_one = compose_records(fi.records, r=r, slots=slots,
                                 p_dollar=fi.p_dollar, chunk_runs=r)
    # a chunk size that neither divides r nor aligns to it: forces
    # multiple chunks plus the overlapping last-chunk recompose
    many, b_many = compose_records(fi.records, r=r, slots=slots,
                                   p_dollar=fi.p_dollar,
                                   chunk_runs=r // 3 - 1)
    assert b_one == b_many
    assert np.array_equal(np.asarray(one), np.asarray(many))

    cids = jnp.asarray((np.arange(r) * 7 % 1000).astype(np.int32))
    onec, _ = compose_records(fi.records, r=r, slots=slots,
                              p_dollar=fi.p_dollar, cids=cids,
                              chunk_runs=r)
    manyc, _ = compose_records(fi.records, r=r, slots=slots,
                               p_dollar=fi.p_dollar, cids=cids,
                               chunk_runs=r // 4 + 3)
    assert np.array_equal(np.asarray(onec), np.asarray(manyc))


def test_chunked_search2_compose_matches_single_shot(setup):
    from movi_tpu.engine.fused_search2 import compose_search2

    text, ix, sc, eng = setup
    import jax.numpy as jnp
    r, sigma = ix.r, ix.sigma
    nu, nd = ix.next_tables_search()
    args = (jnp.asarray(ix.id_arr.astype(np.int32)),
            jnp.asarray(ix.offset_arr.astype(np.int32)),
            jnp.asarray(ix.n_arr.astype(np.int32)),
            jnp.asarray(nu.astype(np.int32)),
            jnp.asarray(nd.astype(np.int32)))
    one = compose_search2(*args, r=r, sigma=sigma, chunk_runs=r)
    many = compose_search2(*args, r=r, sigma=sigma,
                           chunk_runs=r // 3 - 1)
    assert np.array_equal(np.asarray(one), np.asarray(many))
