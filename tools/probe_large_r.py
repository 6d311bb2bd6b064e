#!/usr/bin/env python
"""Large-r capacity probe: run the paired PML engine on a REAL index
with r past 2^24 (the old cap) on one chip, prove bit-exactness against
the one-step engine and the scalar oracle, and measure both rates.

This is the evidence behind the paired layout's advertised envelope
(docs/PERF.md section 6): a ~28 Mbase synthetic text yields r ~ 2.2e7
runs, whose 400 B/run paired table (~8.5 GiB) only fits a 16 GB chip
because the compose is chunked with buffer donation
(engine/fused2.py compose_records) -- a one-shot compose would peak at
2x the table and OOM.  The reference's regular mode addresses r up to
2^32 (move_row_configs.hpp:34-51); past the paired envelope the
one-step engine (40 B/run) takes over automatically (engine/select.py).

Usage: python tools/probe_large_r.py   (~10 min cold, cached after)
Env:   PROBE_TEXT=28000000  PROBE_REPS=8
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from bench import CACHE_DIR, make_reads

N_TEXT = int(os.environ.get("PROBE_TEXT", 28_000_000))
REPS = int(os.environ.get("PROBE_REPS", 8))
LANES, READ_LEN = 32768, 150
N_GOLDEN = 32


def _build_or_load():
    from movi_tpu.engine.fused import (build_fused_index,
                                       load_fused_index,
                                       save_fused_index)

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f"large_{N_TEXT}"
    fi_path = os.path.join(CACHE_DIR, f"{tag}.fused.npz")
    g_path = os.path.join(CACHE_DIR, f"{tag}.golden.npz")
    rng = np.random.default_rng(0)
    text = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=N_TEXT)
    if os.path.exists(fi_path) and os.path.exists(g_path):
        try:
            g = dict(np.load(g_path))
            return load_fused_index(fi_path), text, g
        except Exception:
            pass

    from movi_tpu.build.suffix import build_bwt_runs
    from movi_tpu.cpu_ref.scalar import ScalarEngine
    from movi_tpu.index.structure import build_move_index

    t0 = time.time()
    ix = build_move_index(build_bwt_runs(text), "regular-thresholds",
                          bound_ff=1)
    print(f"# host build: r={ix.r} in {time.time() - t0:.0f}s",
          file=sys.stderr)
    fi = build_fused_index(ix)
    # scalar-oracle goldens on a handful of reads (the full-width
    # equality check below uses the one-step engine, itself bit-exact
    # vs the oracle at every tested scale)
    sc = ScalarEngine(ix)
    greads = make_reads(text, N_GOLDEN, READ_LEN, seed=7)
    gp = np.stack([
        np.asarray(sc.query_pml(greads[i].tobytes()), dtype=np.int32)
        for i in range(N_GOLDEN)])
    g = {"reads": greads.astype(np.uint8), "pmls": gp}
    np.savez(os.path.join(CACHE_DIR, f"{tag}.golden.npz"), **g)
    save_fused_index(fi, fi_path)
    return fi, text, g


def main():
    from movi_tpu.engine.fused import FusedPMLEngine
    from movi_tpu.engine.fused2 import (MAX_RUNS, Fused2PMLEngine,
                                        build_fused2_index)
    from movi_tpu.engine.select import use_paired_pml
    from movi_tpu.io.fastx import ReadBatch

    bench._enable_compile_cache()
    fi, text, g = _build_or_load()
    out = {
        "probe": "large_r_paired",
        "r": int(fi.r),
        "ids_past_2pow24": bool(fi.r > (1 << 24)),
        "paired_table_gib": round(16 * (fi.sigma + 1) ** 2 * fi.r
                                  / 2**30, 2),
        "auto_select_paired": bool(use_paired_pml(fi.r, fi.sigma)),
    }
    assert fi.r < MAX_RUNS

    reads = make_reads(text, LANES, READ_LEN, seed=42)
    out["single_rate_bases_per_sec"] = round(
        bench.tpu_rate(fi, reads, REPS), 1)

    t0 = time.time()
    f2 = build_fused2_index(fi)
    out["compose_seconds"] = round(time.time() - t0, 1)
    out["paired_rate_bases_per_sec"] = round(
        bench.tpu_rate_paired(f2, reads, REPS), 1)

    # bit-exactness at full width: paired vs one-step on 4096 lanes,
    # plus the scalar-oracle goldens through the paired engine
    nb = 4096
    batch = ReadBatch(names=[f"r{i}" for i in range(nb)],
                      seqs=reads[:nb], lengths=np.full(nb, READ_LEN,
                                                       np.int32))
    ml1 = np.asarray(FusedPMLEngine(fi).query_batch_device(batch))
    ml2 = np.asarray(Fused2PMLEngine(f2).query_batch_device(batch))
    out["bitexact_vs_one_step"] = bool(np.array_equal(ml1, ml2))

    gb = ReadBatch(names=[f"g{i}" for i in range(N_GOLDEN)],
                   seqs=g["reads"],
                   lengths=np.full(N_GOLDEN, READ_LEN, np.int32))
    mlg = np.asarray(Fused2PMLEngine(f2).query_batch_device(gb))
    out["bitexact_vs_scalar"] = bool(
        np.array_equal(mlg.T, g["pmls"]))
    assert out["bitexact_vs_one_step"] and out["bitexact_vs_scalar"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
