"""Real-chip probe: decompose MEM v2 query_batch time into upload /
scan-compute / download, and time membership similarly.
`python tools/probe_mem3.py` (env: MOVI_TPU_ONEHOT_W to flip modes)."""

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

import jax
import jax.numpy as jnp

out = {"onehot_w": os.environ.get("MOVI_TPU_ONEHOT_W", "512")}
ix_rc, half = bench["load_large_rc_index"]()
MEM_LANES = int(os.environ.get("BENCH_MEM_LANES", 8192))
READ_LEN = bench["READ_LEN"]
MEM_L = bench["MEM_L"]
reads_mem = bench["make_reads"](half, MEM_LANES, READ_LEN, seed=78)
batch = bench["_to_batch"](reads_mem)

from movi_tpu.engine.fused_mem2 import (FusedMem2Engine, _mem2_scan,
                                        build_fused_mem2_index,
                                        make_mem2_state)
from movi_tpu.io.fastx import left_aligned_slots

m2 = build_fused_mem2_index(ix_rc)
eng = FusedMem2Engine(m2, MEM_L)

# full end-to-end (second call)
dt = bench["_time_query_batch"](eng, batch)
out["e2e_mem_bases_per_sec"] = round(reads_mem.size / dt, 1)

# decompose: upload
amap = m2.alphamap_query.copy()
amap[ord("#")] = -3
al_np = left_aligned_slots(batch, amap)
t0 = time.time()
al = jnp.asarray(al_np)
al.block_until_ready()
_ = np.asarray(al[0, 0])
out["upload_s"] = round(time.time() - t0, 3)

# pure quantum compute: one 4W+64-tick scan, forced by a scalar
state = make_mem2_state(MEM_LANES, batch.width,
                        jnp.asarray(batch.lengths.astype(np.int32)), MEM_L)
ticks = 4 * batch.width + 64
st2, done = _mem2_scan(m2, al, state, MEM_L, ticks)
_ = np.asarray(done)  # compile+warm
state = make_mem2_state(MEM_LANES, batch.width,
                        jnp.asarray(batch.lengths.astype(np.int32)), MEM_L)
t0 = time.time()
st2, done = _mem2_scan(m2, al, state, MEM_L, ticks)
_ = np.asarray(done)
dt_q = time.time() - t0
out["quantum_s"] = round(dt_q, 3)
out["quantum_ticks"] = ticks
out["lane_ticks_per_sec"] = round(MEM_LANES * ticks / dt_q, 1)
alive = int(np.asarray(jnp.sum(st2["phase"] != 5)))
out["alive_after_quantum"] = alive

# download emissions
t0 = time.time()
_ = np.asarray(st2["ends"])
_ = np.asarray(st2["counts"])
out["download_s"] = round(time.time() - t0, 3)

print(json.dumps(out))
