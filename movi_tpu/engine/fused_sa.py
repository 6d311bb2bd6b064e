"""Device SA-entry emission (query --pml --sa-entries).

The reference emits one suffix-array value per base: after the
match/reposition step and BEFORE the LF step, it LF-walks from the
current (run, offset) to the nearest sampled row and adds the walk
distance (get_SA_entries, move_structure.cpp:35-48;
query_pml --sa-entries, move_structure_query.cpp:354-357).

The reported value is path-dependent: a walk crossing the '$' row keeps
adding distance past a wrap, so values can exceed n (the reference does
not normalize).  Bit-exactness therefore requires walking from the SAME
pre-LF state the reference uses.  The fused PML step fuses reposition+LF,
so a small side table supplies the pre-LF reposition target per
(run, char); the match/illegal path's pre-LF state is the scan carry.

Device split: the fused scan emits each base's pre-LF (run, offset); a
lockstep masked while_loop walks all bases to their nearest sampled row.
Bit-exact vs ScalarEngine.query_pml(collect_sa=True)
(tests/test_fused_sa.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .fused import (BIT_USE_LF, FB_MASK, FB_SHIFT, FusedIndex,
                    fused_lf_math, fused_step_math)
from ..io.fastx import ReadBatch


@dataclass
class FusedSAIndex:
    fi: FusedIndex
    # pre_tab[i*slots + a] = (up_run, dn_run, n[up_run] - 1): the
    # reposition target BEFORE its LF, matching reposition_thresholds
    # (move_structure_query.cpp:513-601); the slot-sigma row is unused
    # (illegal chars keep the carry state)
    pre_tab: jax.Array          # int32 [r*(sigma+1), 3]
    all_p: jax.Array            # int64 [r]
    sampled: jax.Array          # int64
    rate: int
    n: int


jax.tree_util.register_dataclass(
    FusedSAIndex, data_fields=["fi", "pre_tab", "all_p", "sampled"],
    meta_fields=["rate", "n"])


def build_fused_sa_index(ix, fi: FusedIndex) -> FusedSAIndex:
    assert ix.sampled_SA is not None, "index has no sampled SA"
    r, sigma = ix.r, ix.sigma
    slots = sigma + 1
    nu, nd = ix.next_tables()
    n64 = ix.n_arr.astype(np.int64)
    pre = np.zeros((r, slots, 3), dtype=np.int64)
    for a in range(sigma):
        up = np.full(r, r, dtype=np.int64)
        dn = np.full(r, r, dtype=np.int64)
        up[1:] = nu[a, :-1]
        dn[:-1] = nd[a, 1:]
        up_c = np.where(up < r, up, 0)
        dn_c = np.where(dn < r, dn, 0)
        pre[:, a, 0] = up_c
        pre[:, a, 1] = dn_c
        pre[:, a, 2] = n64[up_c] - 1
    return FusedSAIndex(
        fi=fi,
        pre_tab=jnp.asarray(pre.reshape(r * slots, 3).astype(np.int32)),
        all_p=jnp.asarray(ix.all_p[:-1].astype(np.int64)),
        sampled=jnp.asarray(ix.sampled_SA.astype(np.int64)),
        rate=int(ix.sa_sample_rate), n=int(ix.length))


@jax.jit
def _pml_pre_state_scan(sx: FusedSAIndex, alphas_t: jax.Array):
    """Fused PML scan that also emits the PRE-LF (run, offset) per base.
    Returns (ml, pre_idx, pre_off), each [W, lanes]."""
    fi = sx.fi
    lanes = alphas_t.shape[1]
    slots = fi.sigma + 1
    # widen uint8 xs once on device (see _fused_pml_scan)
    alphas_t = alphas_t.astype(jnp.int32)
    idx0 = jnp.full((lanes,), fi.start_idx, jnp.int32)
    off0 = jnp.full((lanes,), fi.start_offset, jnp.int32)
    ml0 = jnp.zeros((lanes,), jnp.int32)

    def step(state, a):
        idx, offset, _ = state
        rec_key = idx * slots + a
        rec = jnp.take(fi.records, rec_key, axis=0)
        w1 = rec[:, 1]
        thr = (w1 >> FB_SHIFT) & FB_MASK  # = fb on the mismatch path
        use_lf = (w1 >> BIT_USE_LF) & 1
        # pre-LF state: the carry itself on the match/illegal path, the
        # reposition target otherwise (offset n-1 going up, 0 going down)
        pt = jnp.take(sx.pre_tab, rec_key, axis=0)
        down = offset >= thr
        rep_idx = jnp.where(down, pt[:, 1], pt[:, 0])
        rep_off = jnp.where(down, 0, pt[:, 2])
        lf_path = use_lf == 1
        pre_idx = jnp.where(lf_path, idx, rep_idx)
        pre_off = jnp.where(lf_path, offset, rep_off)
        new_state, ml = fused_step_math(rec, state, fi.p_dollar)
        return new_state, (ml, pre_idx, pre_off)

    _, ys = jax.lax.scan(step, (idx0, off0, ml0), alphas_t)
    return ys


@jax.jit
def _sa_walk(sx: FusedSAIndex, idx: jax.Array, off: jax.Array):
    """LF-walk every (run, offset) to its nearest sampled row (a row
    whose absolute position is a multiple of rate); return the SA values.
    The hitting time is ~rate in expectation but unbounded, so this is a
    while_loop over the whole flat batch, masked per element (the exact
    analogue of the reference's per-call while, move_structure.cpp:38-46).
    idx/off are flat int32 arrays."""
    fi = sx.fi
    all_p, rate = sx.all_p, sx.rate
    slots = fi.sigma + 1
    sigma = fi.sigma

    def cond(carry):
        idx, off, dist = carry
        abs_pos = jnp.take(all_p, idx, axis=0) + off
        return jnp.any(abs_pos % rate != 0)

    def body(carry):
        idx, off, dist = carry
        abs_pos = jnp.take(all_p, idx, axis=0) + off
        active = abs_pos % rate != 0
        # plain LF + bounded ff via the illegal-char record slot
        rec = jnp.take(fi.records, idx * slots + sigma, axis=0)
        n_idx, n_off = fused_lf_math(rec, off)
        return (jnp.where(active, n_idx, idx),
                jnp.where(active, n_off, off),
                dist + active.astype(jnp.int32))

    idx, off, dist = jax.lax.while_loop(
        cond, body, (idx, off, jnp.zeros_like(idx)))
    abs_pos = jnp.take(all_p, idx, axis=0) + off
    return jnp.take(sx.sampled, abs_pos // rate, axis=0) + dist


class FusedSAEngine:
    """Batched PMLs + per-base SA entries on device."""

    def __init__(self, fi: FusedIndex, ix):
        self.sx = build_fused_sa_index(ix, fi)

    def query_batch(self, batch: ReadBatch
                    ) -> List[Tuple[List[int], List[int]]]:
        fi = self.sx.fi
        seqs_rev = batch.seqs[:, ::-1]
        alphas = fi.alphamap_query[seqs_rev]
        alphas_t = jnp.asarray(
            np.ascontiguousarray(alphas.T).astype(np.uint8))
        ml, idx, off = _pml_pre_state_scan(self.sx, alphas_t)
        W, lanes = ml.shape
        sa = _sa_walk(self.sx, idx.reshape(-1),
                      off.reshape(-1)).reshape(W, lanes)
        ml = np.asarray(ml)
        sa = np.asarray(sa)
        out = []
        for lane in range(batch.lanes):
            L = int(batch.lengths[lane])
            out.append((ml[:L, lane].tolist(), sa[:L, lane].tolist()))
        return out
