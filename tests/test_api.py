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


def test_api_device_routing_matches_scalar(tmp_path):
    """query_mems / query_kmers(counts) / multi_classify route through
    the device engines and agree with the scalar fallbacks."""
    rng = np.random.default_rng(82)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    docs = [rng.choice(bases, size=1500) for _ in range(2)]
    ref = str(tmp_path / "ref.fa")
    with open(ref, "w") as f:
        for i, d in enumerate(docs):
            f.write(f">doc{i}\n{d.tobytes().decode()}\n")

    index = movi_tpu.build_index(ref)
    reads = []
    for i in range(10):
        d = int(rng.integers(0, 2))
        L = int(rng.integers(40, 100))
        s = int(rng.integers(0, len(docs[d]) - L))
        reads.append((f"r{i}", docs[d][s : s + L].tobytes()))

    for L in (0, 5):
        dev = dict(index.query_mems(reads, min_mem_length=L))
        cpu = dict(index.query_mems(reads, min_mem_length=L, jax=False))
        assert dev == cpu, L

    dev = dict(index.query_kmers(reads, k=15, counts=True))
    cpu = dict(index.query_kmers(reads, k=15, counts=True, jax=False))
    assert dev == cpu

    from movi_tpu.build.prepare_ref import prepare_ref
    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.color import DocumentInfo, build_color_table

    pref = prepare_ref(ref)
    runs = build_bwt_runs(pref.text)
    di = DocumentInfo.create(pref.doc_offsets)
    ct = build_color_table(index.ix, runs.sa, di)
    dev = dict(index.multi_classify(reads, ct))
    cpu = dict(index.multi_classify(reads, ct, jax=False))
    assert dev == cpu
