"""Fused single-gather PML engine.

The compact engine (engine/pml.py) spends ~20 HBM gathers per base per lane
(row fields, reposition tables, log2(r) searchsorted steps).  On TPU, XLA
gathers execute on the scalar core at ~7 ns/element, so gather *count* is
the wall.  This engine gets the entire PML step down to ONE wide gather:

  1. The index is built with NT-style splitting (`bound_ff=1`,
     index/structure.py:_nt_split, +~3% rows), so a fast-forward is at
     most one step and resolves with a single precomputed cum length.
  2. A per-(run, read-char) record table precomputes EVERYTHING the step
     needs (24 B per record, 6 x int32):
       f0: thr | is_match<<16 | use_lf<<17
       f1: id (LF destination base run)
       f2: cum1 | lf_offset<<16   (cum1 = length of run id, for the ff)
       f3/f4: final (run) after reposition up/down INCLUDING its LF+ff
       f5: final offsets: up_off | dn_off<<16
     Slot sigma is the "illegal character" slot: plain LF, match_len = 0
     (mirrors move_structure_query.cpp:278-284 + :353-361).
  3. The scan body is: one gather, ~15 VPU ops, no data-dependent control
     flow.  Bit-exact against ScalarEngine (tests/test_fused.py).

Memory: (sigma+1) * 24 B per row (~120 B/row for DNA) vs 8 B/row for the
reference's packed regular-thresholds layout -- the classic TPU trade of
HBM capacity for latency-critical access count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from .device_index import build_thr_full
from ..index.structure import MoveIndex
from ..io.fastx import ReadBatch

_GUARD = 0xFFFF  # cum1 guard: "no fast forward possible" (id == r-1)


@dataclass
class FusedIndex:
    r: int
    sigma: int
    records: jax.Array      # int32 [r*(sigma+1), 6]
    start_idx: int          # initial run (r-1)
    start_offset: int       # initial offset (n[r-1]-1)
    alphamap_query: np.ndarray  # host-side: byte -> slot (sigma = illegal)


jax.tree_util.register_dataclass(
    FusedIndex,
    # alphamap_query is host-side only but must be a data field (ndarrays
    # are not hashable as pytree aux data)
    data_fields=["records", "alphamap_query"],
    meta_fields=["r", "sigma", "start_idx", "start_offset"],
)


def build_fused_index(ix: MoveIndex) -> FusedIndex:
    """Precompute the per-(run, char) step records.

    Requires an index built with bound_ff=1 (NT splitting) and thresholds.
    """
    assert ix.thr is not None, "fused engine requires a thresholds mode"
    r, sigma = ix.r, ix.sigma
    n64 = ix.n_arr.astype(np.int64)
    all_p = ix.all_p
    lf_abs = all_p[ix.id_arr] + ix.offset_arr.astype(np.int64)

    # verify the bound_ff=1 invariant
    e = lf_abs + n64 - 1
    id_end = np.searchsorted(all_p[:-1], e, side="right") - 1
    assert int(np.max(id_end - ix.id_arr)) <= 1, (
        "fused engine requires an index built with bound_ff=1")

    thr_full = build_thr_full(ix)          # [r, sigma]
    nu, nd = ix.next_tables()              # query tables ('$' row = slot 0)

    def resolve(abs_pos):
        run = np.searchsorted(all_p[:-1], abs_pos, side="right") - 1
        return run, abs_pos - all_p[run]

    slots = sigma + 1
    rec = np.zeros((r, slots, 6), dtype=np.int64)

    idx_arr = np.arange(r)
    lf_off = ix.offset_arr.astype(np.int64)
    cum1 = np.where(idx_arr < r - 1, n64[np.minimum(ix.id_arr, r - 1)], 0)
    # LF_move only fast-forwards while idx < r-1 (move_structure.cpp:69):
    cum1 = np.where(ix.id_arr < r - 1, n64[ix.id_arr], _GUARD)
    f1 = ix.id_arr.astype(np.int64)
    f2 = cum1 | (lf_off << 16)

    for a in range(sigma):
        # reposition targets from the current run (edge semantics of
        # reposition_up/down: start scanning at idx -/+ 1)
        up = np.full(r, r, dtype=np.int64)
        dn = np.full(r, r, dtype=np.int64)
        up[1:] = nu[a, :-1]
        dn[:-1] = nd[a, 1:]
        up_ok = up < r
        dn_ok = dn < r
        up_c = np.where(up_ok, up, 0)
        dn_c = np.where(dn_ok, dn, 0)
        # final state after reposition + LF + ff (precomputed exactly)
        up_abs = all_p[ix.id_arr[up_c]] + ix.offset_arr[up_c] + n64[up_c] - 1
        dn_abs = all_p[ix.id_arr[dn_c]] + ix.offset_arr[dn_c]
        up_run, up_off = resolve(up_abs)
        dn_run, dn_off = resolve(dn_abs)

        is_match = (ix.c_arr.astype(np.int64) == a).astype(np.int64)
        f0 = thr_full[:, a].astype(np.int64) | (is_match << 16) | (is_match << 17)
        rec[:, a, 0] = f0
        rec[:, a, 1] = f1
        rec[:, a, 2] = f2
        rec[:, a, 3] = np.where(up_ok, up_run, 0)
        rec[:, a, 4] = np.where(dn_ok, dn_run, 0)
        rec[:, a, 5] = np.where(up_ok, up_off, 0) | (np.where(dn_ok, dn_off, 0) << 16)

    # illegal slot: plain LF, no match
    rec[:, sigma, 0] = 1 << 17  # use_lf, no match
    rec[:, sigma, 1] = f1
    rec[:, sigma, 2] = f2

    alphamap_query = np.full(256, sigma, dtype=np.int32)
    for a, ch in enumerate(ix.alphabet):
        alphamap_query[ch] = a
    from ..constants import SEPARATOR
    if ix.separators:
        alphamap_query[SEPARATOR] = sigma

    return FusedIndex(
        r=r, sigma=sigma,
        records=jnp.asarray(rec.reshape(r * slots, 6).astype(np.int32)),
        start_idx=r - 1,
        start_offset=int(ix.n_arr[r - 1]) - 1,
        alphamap_query=alphamap_query,
    )


def save_fused_index(fi: FusedIndex, path: str):
    """Persist the precomputed step records so query startup skips the
    O(r*sigma) host rebuild (~17 s at 4.3 M runs) -- the analogue of the
    reference shipping its packed rlbwt inside index.movi."""
    np.savez(path, records=np.asarray(fi.records),
             meta=np.array([fi.r, fi.sigma, fi.start_idx,
                            fi.start_offset], dtype=np.int64),
             alphamap_query=fi.alphamap_query)


def load_fused_index(path: str) -> FusedIndex:
    z = np.load(path)
    r, sigma, start_idx, start_offset = (int(x) for x in z["meta"])
    return FusedIndex(r=r, sigma=sigma,
                      records=jnp.asarray(z["records"]),
                      start_idx=start_idx, start_offset=start_offset,
                      alphamap_query=z["alphamap_query"])


def fused_pml_step(records: jax.Array, slots: int, state, a_eff):
    """One PML base step: single gather + VPU math."""
    idx, offset, ml = state
    rec = jnp.take(records, idx * slots + a_eff, axis=0)  # [lanes, 6]
    f0 = rec[:, 0]
    thr = f0 & 0xFFFF
    is_match = (f0 >> 16) & 1
    use_lf = (f0 >> 17) & 1

    # LF path (case 1 / illegal): bounded fast-forward via cum1
    f2 = rec[:, 2]
    off0 = (f2 >> 16) + offset
    cum1 = f2 & 0xFFFF
    ff = (off0 >= cum1).astype(jnp.int32)
    c1_run = rec[:, 1] + ff
    c1_off = off0 - ff * cum1

    # reposition path (case 2): final state fully precomputed
    down = offset >= thr
    c2_run = jnp.where(down, rec[:, 4], rec[:, 3])
    f5 = rec[:, 5]
    c2_off = jnp.where(down, f5 >> 16, f5 & 0xFFFF)

    lf_path = use_lf == 1
    new_idx = jnp.where(lf_path, c1_run, c2_run)
    new_off = jnp.where(lf_path, c1_off, c2_off)
    new_ml = jnp.where(is_match == 1, ml + 1, 0)
    return (new_idx, new_off, new_ml), new_ml


@partial(jax.jit, donate_argnums=(1,))
def _fused_pml_scan(fi: FusedIndex, alphas_t: jax.Array):
    """alphas_t: [W, lanes], values in [0, sigma] (sigma = illegal).
    Returns ml [W, lanes].

    alphas arrive as uint8 to quarter the host->device transfer, but the
    scan must slice int32 rows: per-step slicing of a uint8 xs array is
    ~3x slower end-to-end (uint8 tiles are (32, 128), so each row
    extract is strided across 32-row tiles; measured 72 vs 233 Mbases/s),
    so widen ONCE on device before the scan."""
    lanes = alphas_t.shape[1]
    slots = fi.sigma + 1
    alphas_t = alphas_t.astype(jnp.int32)
    idx0 = jnp.full((lanes,), fi.start_idx, dtype=jnp.int32)
    off0 = jnp.full((lanes,), fi.start_offset, dtype=jnp.int32)
    ml0 = jnp.zeros((lanes,), dtype=jnp.int32)

    def step(state, a):
        return fused_pml_step(fi.records, slots, state, a)

    _, ml = jax.lax.scan(step, (idx0, off0, ml0), alphas_t)
    return ml


@jax.jit
def _fused_pml_scan_carry(fi: FusedIndex, alphas_t: jax.Array, state):
    """Chunk of the PML scan with an explicit carried state, for long
    reads (nanopore, up to ~1 Mb): the per-read LF chain is inherently
    serial, so long sequences are handled by chunking the scan with
    carried (idx, offset, match_len) -- SURVEY.md section 5 -- instead of
    compiling one scan per (huge) read-length bucket."""
    slots = fi.sigma + 1
    alphas_t = alphas_t.astype(jnp.int32)

    def step(st, a):
        return fused_pml_step(fi.records, slots, st, a)

    state, ml = jax.lax.scan(step, state, alphas_t)
    return state, ml


class FusedPMLEngine:
    # reads longer than this scan in fixed-size carried chunks (one
    # compile total instead of one per width bucket)
    CHUNK = 2048

    def __init__(self, fi: FusedIndex):
        self.fi = fi

    def query_batch_device(self, batch: ReadBatch) -> jax.Array:
        seqs_rev = batch.seqs[:, ::-1]
        alphas = self.fi.alphamap_query[seqs_rev]  # [lanes, W]
        # ship as uint8 (slot values <= sigma); widened on device
        alphas_t = jnp.asarray(np.ascontiguousarray(alphas.T).astype(np.uint8))
        W, lanes = alphas_t.shape
        if W <= self.CHUNK:
            return _fused_pml_scan(self.fi, alphas_t)
        fi = self.fi
        C = self.CHUNK
        pad = (-W) % C
        if pad:
            # pad the scan TAIL with the illegal slot: reads are
            # right-aligned so columns beyond W - 1 are past every
            # read's end and their emissions are discarded
            alphas_t = jnp.concatenate(
                [alphas_t, jnp.full((pad, lanes), fi.sigma, jnp.uint8)])
        state = (jnp.full((lanes,), fi.start_idx, jnp.int32),
                 jnp.full((lanes,), fi.start_offset, jnp.int32),
                 jnp.zeros((lanes,), jnp.int32))
        mls = []
        for c0 in range(0, W + pad, C):
            state, ml = _fused_pml_scan_carry(
                self.fi, jax.lax.slice_in_dim(alphas_t, c0, c0 + C), state)
            mls.append(ml)
        return jnp.concatenate(mls)[:W]

    def query_batch(self, batch: ReadBatch) -> List[List[int]]:
        ml = np.asarray(self.query_batch_device(batch))
        out = []
        for lane in range(batch.lanes):
            L = int(batch.lengths[lane])
            out.append(ml[:L, lane].tolist())
        return out
