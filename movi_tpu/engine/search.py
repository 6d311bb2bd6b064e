"""Batched backward search: count queries and ZML (JAX).

Vectorization of src/move_structure_search.cpp (update_interval,
backward_search_step, query_backward_search) and query_zml
(move_structure_query.cpp:690-786).  Each lane carries a MoveInterval
(run_start:offset_start, run_end:offset_end); interval updates are
scan-free via the per-character nearest-run tables, and both LF moves
share the fused searchsorted fast-forward.

The reference processes count queries in the prefetch engine with two
prefetches per strand (interval start + end, read_processor.cpp:722-725);
here both ends are just two batched gathers.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .device_index import DeviceIndex
from .pml import lf_step
from ..io.fastx import ReadBatch


def _interval_update(di: DeviceIndex, rs, os_, re, oe, a):
    """update_interval (move_structure_search.cpp:48-61) via gathers.

    Returns (rs', os', re', oe', empty).  Assumes a >= 0 (legal char).
    """
    r = di.r
    a_flat = a * r
    cs = jnp.take(di.c_search, rs, axis=0)
    move_s = cs != a
    rs1 = jnp.where(move_s,
                    jnp.take(di.ch_down_s.reshape(-1),
                             jnp.minimum(a_flat + rs, di.sigma * r - 1), axis=0),
                    rs)
    os1 = jnp.where(move_s, 0, os_)
    empty = (rs1 >= r) | (rs1 > re)

    re_safe = jnp.minimum(re, r - 1)
    ce = jnp.take(di.c_search, re_safe, axis=0)
    move_e = ce != a
    re1 = jnp.where(move_e,
                    jnp.take(di.ch_up_s.reshape(-1),
                             jnp.minimum(a_flat + re_safe, di.sigma * r - 1),
                             axis=0),
                    re_safe)
    re1 = jnp.minimum(re1, r - 1)  # clamp for safe gather when empty
    oe1 = jnp.where(move_e, jnp.take(di.n, re1, axis=0) - 1, oe)
    return rs1, os1, re1, oe1, empty


def _bs_step(di: DeviceIndex, rs, os_, re, oe, a):
    """backward_search_step: interval update + LF both ends.  Lanes with
    illegal chars (a < 0) or empty results report empty=True; their
    returned interval values are unspecified."""
    a_s = jnp.maximum(a, 0)
    rs1, os1, re1, oe1, empty = _interval_update(di, rs, os_, re, oe, a_s)
    empty = empty | (a < 0)
    rs_safe = jnp.minimum(rs1, di.r - 1)
    rs2, os2 = lf_step(di, rs_safe, os1)
    re2, oe2 = lf_step(di, re1, oe1)
    return rs2, os2, re2, oe2, empty


def _init_interval(di: DeviceIndex, a):
    """initialize_backward_search from the first/last run tables
    (move_structure_search.cpp:284-292).  a must be legal."""
    a1 = jnp.maximum(a, 0) + 1
    rs = jnp.take(di.first_runs, a1, axis=0)
    os_ = jnp.take(di.first_offsets, a1, axis=0)
    re = jnp.take(di.last_runs, a1, axis=0)
    oe = jnp.take(di.last_offsets, a1, axis=0)
    return rs, os_, re, oe


@jax.jit
def _count_scan(di: DeviceIndex, alphas_t: jax.Array, lengths: jax.Array):
    """Count query over the batch.

    alphas_t: int32 [W, lanes] processing order (right-to-left; padding -1).
    Returns (matched, count): matched = number of matched suffix chars,
    count = occurrence count, matching query_backward_search semantics.
    """
    W, lanes = alphas_t.shape

    a0 = alphas_t[0]
    legal0 = a0 >= 0
    rs, os_, re, oe = _init_interval(di, a0)
    # lanes whose last char is illegal never start (pos_on_r += 1 => 0/L)
    state = dict(
        rs=rs, os=os_, re=re, oe=oe,
        done=~legal0,
        matched=jnp.where(legal0, 1, 0).astype(jnp.int32),
        # keep the last non-empty interval for the final count
        prs=rs, pos_=os_, pre=re, poe=oe,
    )

    def body(state, a):
        alive = ~state["done"] & (a != -2)  # -2 marks beyond read start
        nrs, nos, nre, noe, empty = _bs_step(
            di, state["rs"], state["os"], state["re"], state["oe"], a)
        step_ok = alive & ~empty
        new = dict(state)
        new["prs"] = jnp.where(step_ok, nrs, state["prs"])
        new["pos_"] = jnp.where(step_ok, nos, state["pos_"])
        new["pre"] = jnp.where(step_ok, nre, state["pre"])
        new["poe"] = jnp.where(step_ok, noe, state["poe"])
        new["rs"] = jnp.where(step_ok, nrs, state["rs"])
        new["os"] = jnp.where(step_ok, nos, state["os"])
        new["re"] = jnp.where(step_ok, nre, state["re"])
        new["oe"] = jnp.where(step_ok, noe, state["oe"])
        new["matched"] = state["matched"] + jnp.where(step_ok, 1, 0)
        new["done"] = state["done"] | (alive & empty)
        return new, None

    state, _ = jax.lax.scan(body, state, alphas_t[1:])

    # count of the final (last non-empty) interval via all_p prefix sums
    abs_s = jnp.take(di.all_p, state["prs"], axis=0) + state["pos_"]
    abs_e = jnp.take(di.all_p, state["pre"], axis=0) + state["poe"]
    started = state["matched"] > 0
    count = jnp.where(started, abs_e - abs_s + 1, 0)
    return state["matched"], count


class CountEngine:
    def __init__(self, di: DeviceIndex):
        self.di = di

    def query_batch(self, batch: ReadBatch) -> List[Tuple[int, int]]:
        """Per read: (pos_on_r, match_count) as the reference's
        query_backward_search + output_counts."""
        seqs_rev = batch.seqs[:, ::-1]
        alphas = np.asarray(self.di.alphamap_query)[seqs_rev].astype(np.int32)
        # mark positions beyond each read's length with -2 (frozen lanes)
        W = batch.width
        t_idx = np.arange(W)[None, :]
        alphas = np.where(t_idx >= batch.lengths[:, None], -2, alphas)
        matched, count = _count_scan(self.di, jnp.asarray(alphas.T),
                                     jnp.asarray(batch.lengths))
        matched = np.asarray(matched)
        count = np.asarray(count)
        out = []
        for lane in range(batch.lanes):
            L = int(batch.lengths[lane])
            m = int(matched[lane])
            # pos_on_r semantics: L - matched; the illegal-first-char case
            # reports pos_on_r = L (matched = 0)
            out.append((L - m, int(count[lane])))
        return out


@jax.jit
def _zml_scan(di: DeviceIndex, alphas_t: jax.Array):
    """ZML matching lengths, one emission per position (processing order).

    Recurrence derived from query_zml (move_structure_query.cpp:690-786):
    at each position emit current match_len (0 if no live interval), then
    try to extend with the next char; on failure or illegal char,
    re-initialize at that next char.
    """
    W, lanes = alphas_t.shape

    a0 = alphas_t[0]
    legal0 = a0 >= 0
    rs, os_, re, oe = _init_interval(di, a0)
    state = dict(rs=rs, os=os_, re=re, oe=oe,
                 have=legal0, ml=jnp.zeros((lanes,), jnp.int32))

    def body(state, a_next):
        emit = jnp.where(state["have"], state["ml"], 0)
        # try to extend lanes that have an interval
        nrs, nos, nre, noe, empty = _bs_step(
            di, state["rs"], state["os"], state["re"], state["oe"], a_next)
        ext_ok = state["have"] & ~empty
        # lanes without interval (or failed extension): re-init at a_next
        irs, ios, ire, ioe = _init_interval(di, a_next)
        legal = a_next >= 0
        reinit = ~ext_ok & legal
        new = dict(
            rs=jnp.where(ext_ok, nrs, irs),
            os=jnp.where(ext_ok, nos, ios),
            re=jnp.where(ext_ok, nre, ire),
            oe=jnp.where(ext_ok, noe, ioe),
            have=ext_ok | reinit,
            ml=jnp.where(ext_ok, state["ml"] + 1, 0),
        )
        return new, emit

    state, emits = jax.lax.scan(body, state, alphas_t[1:])
    last = jnp.where(state["have"], state["ml"], 0)
    return jnp.concatenate([emits, last[None, :]], axis=0)  # [W, lanes]


class ZMLEngine:
    def __init__(self, di: DeviceIndex):
        self.di = di

    def query_batch(self, batch: ReadBatch) -> List[List[int]]:
        seqs_rev = batch.seqs[:, ::-1]
        alphas = np.asarray(self.di.alphamap_query)[seqs_rev].astype(np.int32)
        ml = np.asarray(_zml_scan(self.di, jnp.asarray(alphas.T)))
        out = []
        for lane in range(batch.lanes):
            L = int(batch.lengths[lane])
            out.append(ml[:L, lane].tolist())
        return out
