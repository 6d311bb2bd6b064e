"""Real-chip probe: MEM v1 vs v2 and k-mer membership at HBM scale.

Builds (or loads from .bench_cache) the rc-complete synthetic index and
times FusedMemEngine (v1), FusedMem2Engine (v2), and FusedKmerEngine on
the same batch.  Run on the TPU: `python tools/probe_mem2.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import runpy

bench = runpy.run_path(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"))

bench["_enable_compile_cache"]()

out = {}
t0 = time.time()
ix_rc, half = bench["load_large_rc_index"]()
out["rc_index_runs"] = int(ix_rc.r)
out["index_load_s"] = round(time.time() - t0, 1)

MEM_LANES = int(os.environ.get("BENCH_MEM_LANES", 8192))
READ_LEN = bench["READ_LEN"]
MEM_L = bench["MEM_L"]
reads_mem = bench["make_reads"](half, MEM_LANES, READ_LEN, seed=78)
reads_mixed = bench["make_mixed_reads"](half, MEM_LANES, READ_LEN, seed=77)
batch = bench["_to_batch"](reads_mem)
batch_mixed = bench["_to_batch"](reads_mixed)

which = os.environ.get("PROBE", "v1,v2,kmer").split(",")

if "v2" in which:
    from movi_tpu.engine.fused_mem2 import (FusedMem2Engine,
                                            build_fused_mem2_index)

    t0 = time.time()
    m2 = build_fused_mem2_index(ix_rc)
    out["v2_build_s"] = round(time.time() - t0, 1)
    eng2 = FusedMem2Engine(m2, MEM_L)
    dt = bench["_time_query_batch"](eng2, batch)
    out["v2_mem_bases_per_sec"] = round(reads_mem.size / dt, 1)
    del m2, eng2

if "v1" in which:
    from movi_tpu.engine.fused_mem import (FusedMemEngine,
                                           build_fused_mem_index)

    t0 = time.time()
    mi = build_fused_mem_index(ix_rc)
    out["v1_build_s"] = round(time.time() - t0, 1)
    eng1 = FusedMemEngine(mi, MEM_L)
    dt = bench["_time_query_batch"](eng1, batch)
    out["v1_mem_bases_per_sec"] = round(reads_mem.size / dt, 1)
    del mi, eng1

if "kmer" in which:
    from movi_tpu.engine.fused_kmer import FusedKmerEngine
    from movi_tpu.engine.fused_search import build_fused_search_index

    si = build_fused_search_index(ix_rc)
    k = bench["KMER_K"]
    eng = FusedKmerEngine(si, k)
    dt = bench["_time_query_batch"](eng, batch_mixed)
    out["kmer_membership_per_sec"] = round(
        MEM_LANES * (READ_LEN - k + 1) / dt, 1)

print(json.dumps(out))
