"""Logging engine and streaming pipeline."""

import os

import numpy as np

from movi_tpu.build.suffix import build_bwt_runs
from movi_tpu.cpu_ref.scalar import ScalarEngine
from movi_tpu.index.structure import build_move_index
from movi_tpu.io.stream import BatchStream, run_pipeline
from movi_tpu.logs import LoggingScalarEngine, write_log_files


def _make_index():
    rng = np.random.default_rng(43)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=4000).astype(np.uint8)
    return text, build_move_index(build_bwt_runs(text), "regular-thresholds")


def test_logged_pml_matches_plain(tmp_path):
    text, ix = _make_index()
    eng = LoggingScalarEngine(ix)
    plain = ScalarEngine(ix)
    read = text[50:150].tobytes()
    pmls, logs = eng.query_pml_logged(read)
    assert pmls == plain.query_pml(read)
    assert len(logs.scans) == len(read)
    assert len(logs.fastforwards) == len(read)
    assert sum(eng.stats.ff_counts.values()) == len(read)
    prefix = str(tmp_path / "q")
    write_log_files(prefix, [("r0", logs)])
    for suffix in (".costs", ".scans", ".fastforwards"):
        assert os.path.exists(prefix + suffix)
    with open(prefix + ".fastforwards") as f:
        lines = f.read().splitlines()
    assert lines[0] == ">r0"
    assert [int(x) for x in lines[1].split()] == logs.fastforwards


def test_batch_stream_roundtrip(tmp_path):
    path = str(tmp_path / "reads.fa")
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = {}
    with open(path, "w") as f:
        for i in range(23):
            s = rng.choice(bases, size=int(rng.integers(10, 40))).tobytes()
            reads[f"r{i}"] = s
            f.write(f">r{i}\n{s.decode()}\n")
    seen = {}
    for batch in BatchStream(path, lanes=8):
        for i, name in enumerate(batch.names):
            L = int(batch.lengths[i])
            seen[name] = batch.seqs[i, batch.width - L:].tobytes()
    assert seen == reads


def test_run_pipeline_overlap(tmp_path):
    path = str(tmp_path / "reads.fa")
    with open(path, "w") as f:
        for i in range(10):
            f.write(f">r{i}\nACGTACGTACGT\n")
    launched, collected = [], []
    run_pipeline(path, lanes=4,
                 launch=lambda b: list(b.names),
                 collect=lambda b, fut: collected.extend(fut))
    assert collected == [f"r{i}" for i in range(10)]
