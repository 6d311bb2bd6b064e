"""Reference index.movi serialization: exact byte-size parity with
tests/test_build.cpp golden sizes, and read/write round trip."""

import os

import numpy as np
import pytest

from conftest import REF_DATA, requires_ref_data

from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.movi_format import read_movi, read_movi_header, write_movi
from movi_tpu.index.structure import build_move_index

GOLDEN_SIZES = {
    "regular": 871479,
    "regular-thresholds": 948119,
    "sampled": 437006,
    "sampled-thresholds": 475326,
    "blocked": 654253,
    "blocked-thresholds": 711733,
    "large": 1305995,
}

GOLDEN_SIZES_SEP = {
    "regular": 871496,
    "regular-thresholds": 948232,
    "sampled": 464203,
    "sampled-thresholds": 505009,
    "blocked": 654280,
    "blocked-thresholds": 711854,
}


@requires_ref_data
@pytest.mark.parametrize("mode", sorted(GOLDEN_SIZES))
def test_movi_file_size_matches_reference(bwt_runs, tmp_path, mode):
    ix = build_move_index(bwt_runs, mode)
    p = str(tmp_path / "index.movi")
    write_movi(ix, p)
    assert os.path.getsize(p) == GOLDEN_SIZES[mode], mode


@requires_ref_data
@pytest.mark.parametrize("mode", sorted(GOLDEN_SIZES_SEP))
def test_movi_file_size_with_separators(tmp_path, mode):
    from movi_tpu.build.prepare_ref import prepare_ref
    from movi_tpu.build.suffix import build_bwt_runs

    ref = prepare_ref(os.path.join(REF_DATA, "ref.fasta"), separators=True)
    runs = build_bwt_runs(ref.text)
    ix = build_move_index(runs, mode, separators=True)
    p = str(tmp_path / "index.movi")
    write_movi(ix, p)
    assert os.path.getsize(p) == GOLDEN_SIZES_SEP[mode], mode


@requires_ref_data
def test_movi_roundtrip_regular_thresholds(bwt_runs, sample_reads, tmp_path):
    ix = build_move_index(bwt_runs, "regular-thresholds")
    p = str(tmp_path / "index.movi")
    write_movi(ix, p)
    hdr = read_movi_header(p)
    assert hdr["mode_num"] == 6
    assert hdr["r"] == ix.r
    ix2 = read_movi(p)
    np.testing.assert_array_equal(ix2.n_arr, ix.n_arr)
    np.testing.assert_array_equal(ix2.offset_arr, ix.offset_arr)
    np.testing.assert_array_equal(ix2.id_arr, ix.id_arr)
    np.testing.assert_array_equal(ix2.c_arr, ix.c_arr)
    np.testing.assert_array_equal(ix2.thr, ix.thr)
    # PML equality through the round-tripped index
    e1, e2 = ScalarEngine(ix), ScalarEngine(ix2)
    for name, seq in sample_reads[:5]:
        assert e1.query_pml(seq) == e2.query_pml(seq), name


@requires_ref_data
def test_movi_roundtrip_large(bwt_runs, sample_reads, tmp_path):
    ix = build_move_index(bwt_runs, "large")
    p = str(tmp_path / "index.movi")
    write_movi(ix, p)
    ix2 = read_movi(p)
    np.testing.assert_array_equal(ix2.thr, ix.thr)
    e1, e2 = ScalarEngine(ix), ScalarEngine(ix2)
    for name, seq in sample_reads[:3]:
        assert e1.query_pml(seq) == e2.query_pml(seq), name


@pytest.mark.parametrize("mode", ["blocked", "blocked-thresholds",
                                  "sampled", "sampled-thresholds",
                                  "constant", "split"])
def test_movi_roundtrip_blocked_tally(bwt_runs, tmp_path, mode):
    """Blocked/tally index.movi files read back with ids reconstructed in
    full from (n, c) -- the TPU layout never uses delta/checkpoint ids."""
    import numpy as np

    from movi_tpu.index.movi_format import read_movi, write_movi
    from movi_tpu.index.structure import build_move_index

    ix = build_move_index(bwt_runs, mode)
    p = str(tmp_path / "index.movi")
    write_movi(ix, p)
    ix2 = read_movi(p)
    assert np.array_equal(ix2.n_arr, ix.n_arr)
    assert np.array_equal(ix2.offset_arr, ix.offset_arr)
    assert np.array_equal(ix2.id_arr, ix.id_arr)
    assert np.array_equal(ix2.c_arr, ix.c_arr)
    if ix.thr is not None:
        assert np.array_equal(ix2.thr, ix.thr)


def test_movi_legacy_and_headerless(bwt_runs, tmp_path):
    """--legacy-header (single mode byte) and --no-header layouts
    (write_index_header, move_structure_io.cpp:42-63) roundtrip."""
    import numpy as np

    from movi_tpu.index.movi_format import read_movi, write_movi
    from movi_tpu.index.structure import build_move_index

    ix = build_move_index(bwt_runs, "regular-thresholds")
    p1 = str(tmp_path / "legacy.movi")
    write_movi(ix, p1, header="legacy")
    ix1 = read_movi(p1)
    assert np.array_equal(ix1.n_arr, ix.n_arr)
    assert np.array_equal(ix1.id_arr, ix.id_arr)

    p2 = str(tmp_path / "nohdr.movi")
    write_movi(ix, p2, header="none")
    ix2 = read_movi(p2, mode_hint=6)
    assert np.array_equal(ix2.n_arr, ix.n_arr)
    assert np.array_equal(ix2.thr, ix.thr)


def test_ssa_and_ftab_reference_formats(bwt_runs, tmp_path):
    """ssa.movi (move_structure_io.cpp:710-744) and ftab.<k>.bin
    (:771-832) reference binaries roundtrip."""
    import numpy as np

    from movi_tpu.cpu_ref.advanced import AdvancedEngine
    from movi_tpu.index.movi_format import (read_ftab_bin, read_ssa,
                                            write_ftab_bin, write_ssa)
    from movi_tpu.index.structure import build_move_index

    ix = build_move_index(bwt_runs, "regular-thresholds")
    ix.sampled_SA = bwt_runs.sampled_sa(100)
    ix.sa_sample_rate = 100
    p = str(tmp_path / "ssa.movi")
    write_ssa(ix, p)
    rate, sampled = read_ssa(p)
    assert rate == 100 and np.array_equal(sampled, ix.sampled_SA)
    # header + entries + all_p, all u64
    want_size = 8 + 8 + len(ix.sampled_SA) * 8 + 8 + ix.r * 8
    assert os.path.getsize(p) == want_size

    eng = AdvancedEngine(ix, ftab_k=5)
    p2 = str(tmp_path / "ftab.5.bin")
    write_ftab_bin(eng.ftab, 5, p2)
    k, ftab = read_ftab_bin(p2)
    assert k == 5 and np.array_equal(ftab, eng.ftab)
    assert os.path.getsize(p2) == 16 + (4 ** 5) * 32


def test_movi_colored_roundtrip(bwt_runs, tmp_path):
    """write_movi_colored -> read_movi_colored (MoveRowColored 12 B,
    move_row_colored.hpp)."""
    import numpy as np

    from movi_tpu.index.movi_format import (read_movi_colored,
                                            write_movi_colored)
    from movi_tpu.index.structure import build_move_index

    ix = build_move_index(bwt_runs, "regular-thresholds")
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 500, size=ix.r).astype(np.int64)
    p = str(tmp_path / "index_colored.movi")
    write_movi_colored(ix, colors, p)
    ix2, col2 = read_movi_colored(p)
    assert np.array_equal(col2, colors)
    assert np.array_equal(ix2.n_arr, ix.n_arr)
    assert np.array_equal(ix2.id_arr, ix.id_arr)
    assert np.array_equal(ix2.thr, ix.thr)
