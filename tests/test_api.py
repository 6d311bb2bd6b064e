"""High-level API facade."""

import numpy as np

import movi_tpu
from movi_tpu.classify import EmpNullDatabase


def test_api_end_to_end(tmp_path):
    rng = np.random.default_rng(81)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = rng.choice(bases, size=3000).tobytes()
    ref = str(tmp_path / "ref.fa")
    with open(ref, "w") as f:
        f.write(f">doc1\n{seq.decode()}\n")

    index = movi_tpu.build_index(ref)
    index.save(str(tmp_path / "idx"))
    index2 = movi_tpu.Index.load(str(tmp_path / "idx"))

    reads = [("r0", seq[100:200]), ("r1", b"ACGT" * 10)]
    pml = dict(index2.query_pml(reads))
    assert len(pml["r0"]) == 100
    # exact substring: perfect backward run of matches
    assert max(pml["r0"]) >= 50

    cnt = dict(index2.query_count(reads))
    assert cnt["r0"] == (0, 1)  # exact substring, one fw occurrence
    zml = dict(index2.query_zml(reads))
    assert len(zml["r0"]) == 100

    mems = dict(index2.query_mems([("r0", seq[100:200])]))
    assert mems["r0"][0][:2] == (0, 100)

    kmers = dict(index2.query_kmers([("r0", seq[100:160])], k=21))
    assert sum(c for _, c in kmers["r0"]) == 40

    db = EmpNullDatabase()
    db.compute([1] * 10)
    found = dict(index2.classify(reads, nulldb=db))
    assert found["r0"] is True
