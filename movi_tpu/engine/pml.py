"""Batched PML query engine (JAX).

The reference computes PMLs one read at a time with a serial per-base loop
(move_structure_query.cpp:234-474) and hides memory latency by interleaving
~16 strands with software prefetch (read_processor.cpp:641-730).  Here the
whole batch of reads advances one base per `lax.scan` step in lockstep:

  per step, per lane:
    gather row fields by current run id          (batched HBM gather)
    case 1 (char match)  -> match_len += 1
    case 2 (mismatch)    -> threshold-select direction, scan-free
                            reposition via rep_up/rep_down gather
    LF + fast_forward    -> fused: absolute destination = lf_abs[idx] + off,
                            mapped back to (run, offset) by searchsorted
                            over all_p (log2 r fixed-depth, no data-
                            dependent loop -- move_structure.cpp:524-545
                            becomes branch-free)

Bit-exactness contract: outputs equal ScalarEngine.query_pml for every
read (tests/test_engine.py), the same way the reference requires its
prefetch engine to match the scalar path (tests/test_pml.cpp).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .device_index import DeviceIndex
from ..io.fastx import ReadBatch


def _searchsorted_right(all_p: jax.Array, targets: jax.Array) -> jax.Array:
    """Vectorized searchsorted(all_p, t, 'right')-1 over the lane axis."""
    return jnp.searchsorted(all_p, targets, side="right", method="scan_unrolled") - 1


def lf_step(di: DeviceIndex, idx: jax.Array, offset: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
    """Fused LF_move + fast_forward for a vector of lanes."""
    abs_dest = jnp.take(di.lf_abs, idx, axis=0) + offset
    new_idx = _searchsorted_right(di.all_p, abs_dest)
    # fast_forward never advances past r-1 (move_structure.cpp:532): the
    # searchsorted result is automatically <= r-1 because abs < n.
    new_off = abs_dest - jnp.take(di.all_p, new_idx, axis=0)
    return new_idx.astype(jnp.int32), new_off


def make_pml_step(di: DeviceIndex, random_repositioning: bool = False):
    """Returns the per-base scan body over lane state (idx, offset, ml)."""

    r = di.r

    def step(state, read_alpha):
        idx, offset, match_len = state
        row_alpha = jnp.take(di.c, idx, axis=0).astype(jnp.int32)

        legal = read_alpha >= 0
        a = jnp.maximum(read_alpha, 0)
        case1 = legal & (row_alpha == a)
        case2 = legal & ~case1

        # --- case 2: reposition ---
        if not random_repositioning:
            thr = jnp.take(
                di.thr_full.reshape(-1), idx * di.sigma + a, axis=0)
            go_up = offset < thr
        else:
            n_here = jnp.take(di.n, idx, axis=0)
            go_up = 2 * offset < n_here
            go_up = jnp.where(idx == r - 1, True, go_up)
            go_up = jnp.where(idx == 0, False, go_up)

        flat_up = jnp.take(di.rep_up.reshape(-1), a * r + idx, axis=0)
        flat_down = jnp.take(di.rep_down.reshape(-1), a * r + idx, axis=0)
        if random_repositioning:
            # fall back to the other direction when the first fails
            # (move_structure_query.cpp:604-688)
            up_ok = flat_up < r
            down_ok = flat_down < r
            go_up = jnp.where(go_up & ~up_ok, False, go_up)
            go_up = jnp.where(~go_up & ~down_ok, True, go_up)
        dest = jnp.where(go_up, flat_up, flat_down)

        rep_idx = dest
        rep_off = jnp.where(go_up, jnp.take(di.n, rep_idx, axis=0) - 1, 0)

        new_idx = jnp.where(case2, rep_idx, idx)
        new_off = jnp.where(case2, rep_off, offset)
        # mismatch OR illegal char -> match_len = 0; illegal keeps position
        # (move_structure_query.cpp:278-284) but LF still runs.
        new_ml = jnp.where(case1, match_len + 1, jnp.zeros_like(match_len))
        out_ml = new_ml

        lf_idx, lf_off = lf_step(di, new_idx, new_off)
        return (lf_idx, lf_off, new_ml), out_ml

    return step


@partial(jax.jit, static_argnums=(2,))
def _pml_scan(di: DeviceIndex, read_alphas_t: jax.Array,
              random_repositioning: bool):
    """read_alphas_t: int32 [W, lanes] in processing order (right-to-left).
    Returns ml_out [W, lanes]."""
    lanes = read_alphas_t.shape[1]
    idx0 = jnp.full((lanes,), di.r - 1, dtype=jnp.int32)
    off0 = jnp.full((lanes,), jnp.take(di.n, di.r - 1) - 1, dtype=jnp.int32)
    ml0 = jnp.zeros((lanes,), dtype=jnp.int32)
    step = make_pml_step(di, random_repositioning)
    _, ml_out = jax.lax.scan(step, (idx0, off0, ml0), read_alphas_t)
    return ml_out


class PMLEngine:
    """Batched PML computation over padded read batches."""

    def __init__(self, di: DeviceIndex, random_repositioning: bool = False):
        self.di = di
        self.random_repositioning = random_repositioning

    def query_batch(self, batch: ReadBatch) -> List[List[int]]:
        """Returns per-read PML lists in processing order (right-to-left),
        exactly matching ScalarEngine.query_pml."""
        ml = self.query_batch_device(batch)
        ml = np.asarray(ml)  # [W, lanes]
        out = []
        for lane in range(batch.lanes):
            L = int(batch.lengths[lane])
            out.append(ml[:L, lane].tolist())
        return out

    def query_batch_device(self, batch: ReadBatch) -> jax.Array:
        # right-aligned: processing order = reversed columns
        seqs_rev = batch.seqs[:, ::-1]  # [lanes, W], step t = read pos L-1-t
        alphas = np.asarray(self.di.alphamap_query)[seqs_rev]  # [lanes, W]
        alphas_t = jnp.asarray(alphas.T.astype(np.int32))      # [W, lanes]
        return _pml_scan(self.di, alphas_t, self.random_repositioning)
