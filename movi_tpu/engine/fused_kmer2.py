"""Exact k-mer counting v2: the reference's bidirectional k/2 cache
(query_kmers_from_bidirectional, sequitur.cpp:14-255) restructured as
straight-line device scans.

The v1 engines re-extend every window from scratch: k-1 extensions per
k-mer (fused_kmer._kmer_count_scan; paired halves the gathers).  The
reference amortizes overlapping windows: ONE bidirectional chain per
block of p = k/2 consecutive window ends, anchored at the rightmost
window's left end, extends RIGHT once across the block, caching each
prefix interval past the midpoint; every cached partial then pays only
its own LEFT extensions (depth d = 1..p-1).  Work per k-mer drops from
k-1 to ~(k-1)/p + (p-1)/2 extensions.

TPU shape (no tick machine -- per-tick one-hot bookkeeping caps tick
machines at ~18 M ticks/s, well under the gather roofline):

  - lanes = GROUPS.  Phase R is one `lax.scan` of k-1 uniform
    extend_right steps on the MEM-v2 wide records (engine/fused_mem2):
    one 2-row gather per step, the fw interval carried purely in
    ABSOLUTE coordinates (skip and abs come embedded in the record).
    Partial intervals are the scan's emissions -- free.
  - Phase L runs per DEPTH BUCKET d: all groups' depth-d partials
    (host-compacted to the ALIVE ones -- dead partials cost nothing,
    the device analogue of the reference's skipping) resolve abs ->
    (run, offset) once via the records table's pos2rba rows, then run
    ceil(d/2) composed PAIRED extensions (engine/fused_search2) --
    1 gathered row per extension.

Counts are identical to the per-window definition for ANY p (each
block's windows are counted exactly once; a dead chain at j kills
exactly the windows containing j).  Bit-exact vs
AdvancedEngine.count_kmers_bidirectional (tests/test_fused_kmer2.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .fused_mem2 import (FusedMem2Index, _init6, mem2_resolve, mem2_step)
from .fused_search2 import FusedSearch2Index, _IKEYS, fused2_bs_step
from ..io.fastx import ReadBatch


def _pow2(x: int, lo: int = 256) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(x, 1)))))


@partial(jax.jit, static_argnums=(2,))
def _kmer2_right_scan(m2: FusedMem2Index, rchars: jax.Array, k: int):
    """Phase R: per group, init at rchars[0] and extend_right with
    rchars[1..k-1].  Returns (alive [k-1, G], fw_abs_s, fw_abs_e)."""
    sigma = m2.sigma
    a0 = rchars[0]
    i_f = _init6(m2, a0)
    a0r = jnp.where(a0 >= 0, sigma - 1 - a0, -1)
    i_r = _init6(m2, a0r)
    alive0 = a0 >= 0
    st0 = dict(rrs=i_r[0], ros=i_r[1], rre=i_r[2], roe=i_r[3],
               fas=i_f[4], fae=i_f[5], alive=alive0)

    def step(st, c):
        a = jnp.where(c >= 0, sigma - 1 - c, -1)
        nrs, nos, nre, noe, nas, nae, skip, empty = mem2_step(
            m2, st["rrs"], st["ros"], st["rre"], st["roe"], a)
        ok = st["alive"] & ~empty
        fas2 = jnp.where(ok, st["fas"] + skip, st["fas"])
        fae2 = fas2 + jnp.where(ok, nae - nas, st["fae"] - st["fas"])
        new = dict(rrs=jnp.where(ok, nrs, st["rrs"]),
                   ros=jnp.where(ok, nos, st["ros"]),
                   rre=jnp.where(ok, nre, st["rre"]),
                   roe=jnp.where(ok, noe, st["roe"]),
                   fas=fas2, fae=fae2, alive=ok)
        return new, (ok, fas2, fae2)

    _, (alives, fs, fe) = jax.lax.scan(step, st0, rchars[1:])
    return alives, fs, fe


@jax.jit
def _kmer2_left_flat(m2: FusedMem2Index, s2: FusedSearch2Index,
                     fsd, fed, flat_idx, a1s, a2s):
    """Phase L, ALL depths in one call: lanes are the alive partials of
    every depth; each lane's char stream is padded with the -2 no-op
    sentinel past its own depth, so one fixed-length paired scan serves
    every bucket.  The partials' fw abs intervals are gathered from the
    DEVICE-RESIDENT phase-R emissions by flat (row, group) index -- the
    30 ms-per-call relay made 14 per-depth calls the dominant cost
    (~6 round trips each); this is ~5 round trips total.  Returns
    (found, count)."""
    abs_s = jnp.take(fsd.ravel(), flat_idx, axis=0)
    abs_e = jnp.take(fed.ravel(), flat_idx, axis=0)
    rs, os_ = mem2_resolve(m2, abs_s)
    re, oe = mem2_resolve(m2, abs_e)
    state = dict(rs=rs, os=os_, re=re, oe=oe,
                 dead=jnp.zeros(rs.shape, bool))

    def body(state, xs):
        a1, a2 = xs
        l2 = a2 >= 0
        # -2 is the PAD sentinel (no-op: a lane whose depth is shorter
        # than the flat stream just coasts); -1 is a genuine illegal
        # read char, which must KILL the window (unlike the per-window
        # engines, lanes here are not pre-filtered for legality)
        pad1 = a1 == -2
        kill2 = a2 == -1
        mid, fin, e1, e2 = fused2_bs_step(
            s2, state["rs"], state["os"], state["re"], state["oe"],
            jnp.maximum(a1, 0) * s2.sigma + jnp.maximum(a2, 0),
            a1 >= 0, l2)
        alive = ~state["dead"]
        ok1 = alive & ~e1
        ok2 = ok1 & ~e2
        new = dict(dead=state["dead"]
                   | (alive & ((~pad1 & e1) | (l2 & ~e1 & e2)
                               | (~e1 & kill2))))
        for kk, m, f in zip(_IKEYS, mid, fin):
            new[kk] = jnp.where(ok2, f, jnp.where(ok1, m, state[kk]))
        return new, None

    state, _ = jax.lax.scan(body, state, (a1s, a2s))
    found = ~state["dead"]
    cnt = (jnp.take(s2.all_p, state["re"], axis=0) + state["oe"]
           - jnp.take(s2.all_p, state["rs"], axis=0) - state["os"] + 1)
    return found, jnp.where(found, cnt, 0)


class FusedKmer2CountEngine:
    """Exact per-read k-mer (found, total) on the bidirectional-cache
    scheme.  Results identical to FusedKmerCountEngine /
    AdvancedEngine.count_kmers_bidirectional."""

    def __init__(self, m2: FusedMem2Index, s2: FusedSearch2Index,
                 k: int, p: int = 0):
        assert k >= 2
        self.m2 = m2
        self.s2 = s2
        self.k = k
        # block size: k/2 mirrors the reference; any p gives identical
        # counts (it only moves work between the shared right chain and
        # the per-window left chains)
        self.p = min(p or k // 2, k - 1) or 1

    def query_batch(self, batch: ReadBatch) -> List[Tuple[int, int]]:
        from ..io.fastx import left_aligned_slots

        k, p = self.k, self.p
        m2 = self.m2
        al = left_aligned_slots(batch, m2.alphamap_query, fill=-1)
        lens = batch.lengths.astype(np.int64)
        nw = np.maximum(lens - k + 1, 0)
        ng = -(-nw // p)  # groups per read
        f_out = np.zeros(batch.lanes, dtype=np.int64)
        t_out = np.zeros(batch.lanes, dtype=np.int64)
        G = int(ng.sum())
        if G == 0:
            return [(0, 0)] * batch.lanes

        own = np.repeat(np.arange(batch.lanes), ng)
        gi = np.concatenate([np.arange(x) for x in ng]).astype(np.int64)
        e = lens[own] - 1 - gi * p            # rightmost end per group
        anchor = e - k + 1
        p_eff = np.minimum(p, e - k + 2)      # windows in the block

        Gp = _pow2(G)
        # ship the chain chars as int8 (25 MB/s relay link), widen once
        # on device
        rchars = np.full((k, Gp), -1, dtype=np.int8)
        cols = anchor[:, None] + np.arange(k)[None, :]
        rchars[:, :G] = al[own[:, None], cols].T
        lch = None
        if p > 1:
            lcols = anchor[:, None] - 1 - np.arange(p - 1)[None, :]
            ok = lcols >= 0
            lch = np.where(ok, al[own[:, None], np.maximum(lcols, 0)],
                           -2).T.astype(np.int8)

        alives_d, fsd, fed = _kmer2_right_scan(
            m2, jnp.asarray(rchars).astype(jnp.int32), k)
        # only the alive flags cross back to the host (bool [k-1, G]);
        # the partial abs intervals stay device-resident for the
        # phase-L gather
        alives = np.asarray(alives_d)[:, :G]

        # depth 0: the full-right window at e
        f0 = alives[-1]
        d0 = np.asarray(jnp.stack([fsd[-1], fed[-1]]))[:, :G]
        np.add.at(f_out, own[f0], 1)
        np.add.at(t_out, own[f0], (d0[1] - d0[0] + 1)[f0])

        if p > 1:
            # flatten the alive partials of every depth into one lane
            # set: lane (d, g) extends left d times, then -2 no-ops
            ds = np.arange(1, p)[:, None]                  # [p-1, 1]
            rows = k - 2 - ds                              # [p-1, 1]
            mask = alives[rows[:, 0]] & (ds <= p_eff[None, :] - 1)
            dd, gg = np.nonzero(mask)                      # depth-1, group
            if len(dd):
                M = _pow2(len(dd))
                flat_idx = np.zeros(M, dtype=np.int32)
                flat_idx[: len(dd)] = (rows[dd, 0] * Gp + gg)
                S2 = p - 1 + ((p - 1) & 1)
                chars = np.full((S2, M), -2, dtype=np.int8)
                # lane j takes lch[:d_j, g_j]; columns past d_j stay -2
                depth = dd + 1
                take = np.arange(p - 1)[:, None] < depth[None, :]
                chars[: p - 1, : len(dd)] = np.where(
                    take, lch[:, gg], -2)
                chars[:, len(dd):] = -1  # pad lanes: first step fails
                ch_d = jnp.asarray(chars).astype(jnp.int32)
                found, cnt = _kmer2_left_flat(
                    m2, self.s2, fsd, fed, jnp.asarray(flat_idx),
                    ch_d[0::2], ch_d[1::2])
                found = np.asarray(found)[: len(dd)]
                cnt = np.asarray(cnt)[: len(dd)]
                np.add.at(f_out, own[gg][found], 1)
                np.add.at(t_out, own[gg][found], cnt[found])

        return [(int(f_out[i]), int(t_out[i]))
                for i in range(batch.lanes)]
