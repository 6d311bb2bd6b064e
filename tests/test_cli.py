"""End-to-end CLI tests (subprocess), matching the reference's golden
test style: build then query then diff."""

import os
import subprocess
import sys

import pytest

from conftest import REF_DATA, requires_ref_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-m", "movi_tpu.cli"] + args,
                          cwd=REPO, env=env, capture_output=True,
                          text=True, **kw)


@requires_ref_data
def test_cli_build_query_golden(tmp_path):
    idx = str(tmp_path / "idx")
    r = _run(["build", "--fasta", os.path.join(REF_DATA, "ref.fasta"),
              "--index", idx, "--skip-null", "--verify"])
    assert r.returncode == 0, r.stderr
    r = _run(["query", "--index", idx,
              "--read", os.path.join(REF_DATA, "sample.fastq"),
              "--pml", "--stdout", "--platform", "cpu"])
    assert r.returncode == 0, r.stderr
    assert "fused" in r.stderr
    got = sorted(r.stdout.splitlines(), key=str.encode)
    with open(os.path.join(REF_DATA, "sample.fastq.pmls.sorted")) as f:
        want = f.read().splitlines()
    assert got == want


@requires_ref_data
def test_cli_sa_entries(tmp_path):
    idx = str(tmp_path / "idx")
    r = _run(["build", "--fasta", os.path.join(REF_DATA, "ref.fasta"),
              "--index", idx, "--skip-null", "--sa-entries"])
    assert r.returncode == 0, r.stderr
    reads = str(tmp_path / "reads.fa")
    with open(os.path.join(REF_DATA, "sample.fasta")) as f:
        content = f.read()
    with open(reads, "w") as f:
        f.write("\n".join(content.splitlines()[:4]) + "\n")
    r = _run(["query", "--index", idx, "--read", reads, "--pml",
              "--sa-entries", "--out-file", str(tmp_path / "o")])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(str(tmp_path / "o") + ".pml.sa_entries.bpf")
