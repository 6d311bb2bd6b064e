"""Golden-file PML equality vs the reference outputs (the same contract as
tests/test_pml.cpp: stdout lines, LC_ALL=C-sorted, must be identical)."""

import subprocess

import pytest

from conftest import REF_DATA, requires_ref_data

from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.outputs import pml_stdout_lines


def _sorted_lines(lines):
    # LC_ALL=C sort == python sort on raw bytes
    return sorted(lines, key=lambda s: s.encode())


def _run_mode(bwt_runs, reads, mode):
    ix = build_move_index(bwt_runs, mode)
    eng = ScalarEngine(ix)
    lines = []
    for name, seq in reads:
        pmls = eng.query_pml(seq)
        lines.extend(pml_stdout_lines(name, pmls))
    return _sorted_lines(lines)


@requires_ref_data
@pytest.mark.parametrize("mode", ["regular-thresholds", "large",
                                  "sampled-thresholds", "blocked-thresholds"])
def test_pml_golden_all_threshold_modes(bwt_runs, sample_reads,
                                        golden_pmls_sorted, mode):
    lines = _run_mode(bwt_runs, sample_reads, mode)
    golden = golden_pmls_sorted.splitlines()
    assert lines == golden
