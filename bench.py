#!/usr/bin/env python
"""Headline benchmark: PML query throughput (bases/sec) on one chip.

Mirrors the BASELINE.md north star: PML on a regular-thresholds index.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: single-core Movi-CPU PML throughput.  The reference repo
publishes no absolute numbers (BASELINE.md); until the native C++ scalar
baseline harness lands, we use 5.0 Mbases/s as the assumed single-core
Movi-CPU rate (order of magnitude from the iScience 2024 paper's
~hundreds-of-ns-per-base regime).  The ≥10x target is therefore
vs_baseline >= 10.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_BASES_PER_SEC = 5.0e6

LANES = int(os.environ.get("BENCH_LANES", 32768))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 150))
REPS = int(os.environ.get("BENCH_REPS", 5))


def main():
    import jax

    from movi_tpu.build.prepare_ref import prepare_ref
    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.engine.device_index import build_device_index
    from movi_tpu.engine.pml import _pml_scan
    from movi_tpu.index.structure import build_move_index

    ref_fasta = "/root/reference/tests_data/ref.fasta"
    if os.path.exists(ref_fasta):
        text = prepare_ref(ref_fasta).text
    else:
        rng = np.random.default_rng(0)
        text = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200000)

    runs = build_bwt_runs(text)
    ix = build_move_index(runs, "regular-thresholds")
    di = build_device_index(ix)

    # synthetic error-bearing reads sampled from the reference
    rng = np.random.default_rng(42)
    starts = rng.integers(0, len(text) - READ_LEN, size=LANES)
    reads = np.stack([text[s : s + READ_LEN] for s in starts])
    err = rng.random(reads.shape) < 0.01
    reads = np.where(err, rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                     size=reads.shape), reads)

    alphamap = np.asarray(di.alphamap_query)
    alphas_t = jax.numpy.asarray(
        alphamap[reads[:, ::-1]].T.astype(np.int32))  # [W, lanes]

    # compile
    out = _pml_scan(di, alphas_t, False)
    out.block_until_ready()

    t0 = time.time()
    for _ in range(REPS):
        out = _pml_scan(di, alphas_t, False)
    out.block_until_ready()
    dt = (time.time() - t0) / REPS

    bases = LANES * READ_LEN
    bases_per_sec = bases / dt
    print(json.dumps({
        "metric": "pml_bases_per_sec_per_chip",
        "value": round(bases_per_sec, 1),
        "unit": "bases/sec",
        "vs_baseline": round(bases_per_sec / BASELINE_BASES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
