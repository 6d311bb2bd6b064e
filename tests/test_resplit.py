"""Load-time NT re-splitting of reference-format indexes
(index/resplit.py) and device-path --ignore-illegal-chars."""

import os
import subprocess
import sys

import numpy as np
import pytest

from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.engine.fused import FusedPMLEngine, build_fused_index
from movi_tpu.index.movi_format import read_movi, write_movi
from movi_tpu.index.resplit import needs_resplit, resplit_index
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.fastx import iter_fastx, make_batches
from movi_tpu.io.outputs import pml_stdout_lines

from conftest import REF_DATA, requires_ref_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@requires_ref_data
def test_resplit_reference_index_runs_fused_golden(tmp_path, bwt_runs):
    """A read_movi-loaded regular-thresholds index (no bound_ff
    invariant) re-splits and then queries through FusedPMLEngine with
    golden-identical PMLs."""
    ix0 = build_move_index(bwt_runs, "regular-thresholds", bound_ff=None)
    path = str(tmp_path / "index.movi")
    write_movi(ix0, path)
    ix1 = read_movi(path)
    assert needs_resplit(ix1)
    ix2 = resplit_index(ix1)
    assert not needs_resplit(ix2)
    assert ix2.r >= ix1.r

    eng = FusedPMLEngine(build_fused_index(ix2))
    reads = list(iter_fastx(os.path.join(REF_DATA, "sample.fastq")))
    lines = []
    for batch in make_batches(reads, lanes=64):
        for name, pmls in zip(batch.names, eng.query_batch(batch)):
            lines.extend(pml_stdout_lines(name, pmls))
    with open(os.path.join(REF_DATA, "sample.fastq.pmls.sorted")) as f:
        want = f.read().splitlines()
    assert sorted(lines, key=str.encode) == want

    # scalar engines agree on the re-split rows too (thr remap + LF)
    sc = ScalarEngine(ix2)
    name, seq = reads[0]
    assert sc.query_pml(seq) == ScalarEngine(ix0).query_pml(seq)


@requires_ref_data
def test_cli_movi_format_index_uses_fused_engine(tmp_path):
    """End-to-end: build --movi-format (unsplit reference bytes), then
    query --pml -- the load-time re-split must put it on a fused
    engine and still match the golden."""
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "movi_tpu.cli", "build",
         "--fasta", os.path.join(REF_DATA, "ref.fasta"), "--index", idx,
         "--type", "regular-thresholds", "--movi-format"],
        cwd=REPO, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(idx, "index.movi"))
    # remove any native npz so the movi path is what loads
    npz = os.path.join(idx, "index.npz")
    if os.path.exists(npz):
        os.remove(npz)
    r = subprocess.run(
        [sys.executable, "-m", "movi_tpu.cli", "query", "--index", idx,
         "--read", os.path.join(REF_DATA, "sample.fastq"), "--pml",
         "--stdout", "--platform", "cpu"],
        cwd=REPO, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "re-split reference-format index" in r.stderr
    assert ("fused" in r.stderr or "paired-record" in r.stderr)
    with open(os.path.join(REF_DATA, "sample.fastq.pmls.sorted")) as f:
        want = f.read().splitlines()
    assert sorted(r.stdout.splitlines(), key=str.encode) == want


@requires_ref_data
@pytest.mark.parametrize("mode", [1, 2])
def test_ignore_illegal_chars_device_parity(tmp_path, bwt_runs,
                                            index_regular_thr, mode):
    """Device-path --ignore-illegal-chars output == ScalarEngine with
    the flag on the RAW reads (modes 1 and 2)."""
    ix = index_regular_thr
    rng = np.random.default_rng(4)
    src = list(iter_fastx(os.path.join(REF_DATA, "sample.fastq")))[:12]
    reads_path = str(tmp_path / "nreads.fastq")
    dirty = []
    with open(reads_path, "w") as f:
        for name, seq in src:
            arr = bytearray(seq)
            for p in rng.integers(0, len(arr), size=4):
                arr[p] = ord(rng.choice(list("NRYX")))
            dirty.append((name, bytes(arr)))
            f.write(f"@{name}\n{bytes(arr).decode()}\n+\n"
                    f"{'I' * len(arr)}\n")

    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "movi_tpu.cli", "build",
         "--fasta", os.path.join(REF_DATA, "ref.fasta"), "--index", idx],
        cwd=REPO, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "movi_tpu.cli", "query", "--index", idx,
         "--read", reads_path, "--pml", "--stdout", "--platform", "cpu",
         "--ignore-illegal-chars", str(mode)],
        cwd=REPO, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert ("fused" in r.stderr or "paired-record" in r.stderr)

    sc = ScalarEngine(ix, ignore_illegal_chars=mode, seed=0)
    want = []
    for name, seq in dirty:
        want.extend(pml_stdout_lines(name, sc.query_pml(seq)))
    assert (sorted(r.stdout.splitlines(), key=str.encode)
            == sorted(want, key=str.encode))
