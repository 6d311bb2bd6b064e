"""Automatic engine selection: pick the speed layout when it fits HBM.

The engine ladder (docs/PERF.md section 2) trades memory for gathered
rows per base: the paired PML records cost 16*(sigma+1)^2 B/run
(400 B/run for DNA) and the paired search records 48*sigma^2 B/run
(768 B/run), vs 40 B/run for the one-step fused layout.  The reference
auto-dispatches on the index mode byte (movi_launcher.cpp:408-434);
here the dispatch is on CAPACITY: use the paired layout when its table
fits a budgeted fraction of accelerator memory and the packed run-id
width, else fall back to the one-step engine.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_HBM_BYTES = 16 << 30     # one v5e chip
# leave room for the one-step records (compose input), read batches,
# color tables, and XLA scratch
BUDGET_FRACTION = 0.5
# tables at or under this stay VMEM-resident and gather at 215-260 M
# rows/s (docs/PERF.md section 1) -- measured: a VMEM one-step table
# beats the paired layout (202 vs 169 Mbases/s at r = 122k, where the
# 49 MB paired table has already spilled to HBM), so small indexes
# keep the one-step engine
VMEM_TABLE_BYTES = 5 << 20


def device_memory_budget() -> int:
    """Accelerator memory budget in bytes.  Override with
    MOVI_TPU_HBM_BYTES (used by tests and capacity planning); else the
    backend's reported limit; else one v5e's 16 GB."""
    env = os.environ.get("MOVI_TPU_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > (2 << 30):
            return limit
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def paired_pml_table_bytes(r: int, sigma: int) -> int:
    return 16 * (sigma + 1) ** 2 * r


def paired_search_table_bytes(r: int, sigma: int) -> int:
    return 2 * 24 * sigma * sigma * r


def one_step_fits_vmem(r: int, sigma: int) -> bool:
    """True when the one-step fused table (8 B/slot) is small enough to
    stay VMEM-resident, where it out-gathers any HBM layout."""
    return 8 * (sigma + 1) * r <= VMEM_TABLE_BYTES


def use_paired_pml(r: int, sigma: int,
                   force: Optional[bool] = None) -> bool:
    """True when PML should run on the paired two-base records."""
    from .fused2 import MAX_RUNS

    if force is not None:
        return force
    if one_step_fits_vmem(r, sigma):
        return False
    return (r < MAX_RUNS and paired_pml_table_bytes(r, sigma)
            <= BUDGET_FRACTION * device_memory_budget())


def use_paired_color(r: int, sigma: int, num_sets: int,
                     force: Optional[bool] = None) -> bool:
    """True when Movi Color should run on the paired 32 B records
    (which additionally require the kept-set count to fit 16 bits)."""
    from .fused2 import MAX_RUNS

    if force is not None:
        return force and num_sets + 1 <= 0xFFFF
    if 12 * (sigma + 1) * r <= VMEM_TABLE_BYTES:  # one-step color table
        return False
    return (r < MAX_RUNS and num_sets + 1 <= 0xFFFF
            and 2 * paired_pml_table_bytes(r, sigma)
            <= BUDGET_FRACTION * device_memory_budget())


def use_paired_search(r: int, sigma: int,
                      force: Optional[bool] = None) -> bool:
    """True when count/ZML should run on the paired search records."""
    from .fused_search2 import MAX_RUNS

    if force is not None:
        return force
    if 32 * sigma * r <= VMEM_TABLE_BYTES:  # one-step search table
        return False
    return (r < MAX_RUNS and sigma + 2 <= 8
            and paired_search_table_bytes(r, sigma)
            <= BUDGET_FRACTION * device_memory_budget())


def one_step_pml_table_bytes(r: int, sigma: int) -> int:
    return 8 * (sigma + 1) * r


def one_step_search_table_bytes(r: int, sigma: int) -> int:
    return 32 * sigma * r


def pick_backend(r: int, sigma: int, kind: str = "pml",
                 model_shards: int = 1,
                 force_paired: Optional[bool] = None) -> str:
    """Full engine ladder selection (docs/PERF.md section 6): 'paired'
    when the two-step layout fits, else 'one-step', else -- when the
    one-step table itself exceeds the budget and a model mesh axis is
    available -- 'sharded' (parallel/sharded_index.py: table split over
    model_shards chips, capacity x shards), else the 'compact'
    fallback."""
    one_step = (one_step_pml_table_bytes if kind == "pml"
                else one_step_search_table_bytes)(r, sigma)
    paired = (use_paired_pml if kind == "pml"
              else use_paired_search)(r, sigma, force=force_paired)
    if paired:
        return "paired"
    budget = BUDGET_FRACTION * device_memory_budget()
    if one_step <= budget:
        return "one-step"
    if model_shards > 1 and one_step <= budget * model_shards:
        return "sharded"
    return "compact"
