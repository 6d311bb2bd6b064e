"""Multi-host deployment helpers.

The reference is single-process (OpenMP).  movi_tpu scales across hosts
with jax.distributed: every host runs the same program, streams its own
shard of the read file, and queries against a replicated (or
model-sharded) index.  Per-read outputs are written host-locally; only
aggregate statistics cross hosts (one psum at the end).

Launch on each host:

    python -m movi_tpu.parallel.multihost --coordinator host0:1234 \
        --num-hosts 4 --host-id $ID --index idx --read reads.fastq --pml
"""

from __future__ import annotations

import argparse
from typing import Iterator, List, Tuple


def initialize(coordinator: str, num_hosts: int, host_id: int):
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_hosts,
                               process_id=host_id)
    return jax


def shard_reads(reads: Iterator[Tuple[str, bytes]], num_hosts: int,
                host_id: int) -> Iterator[Tuple[str, bytes]]:
    """Round-robin read sharding across hosts (each host parses the file
    and keeps every num_hosts-th read; for production use a byte-range
    splitter instead)."""
    for i, r in enumerate(reads):
        if i % num_hosts == host_id:
            yield r


def merged_found_count(local_found: int) -> int:
    """psum of per-host classification counters over all hosts."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    import numpy as np

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("data",))

    @lambda f: shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())
    def total(x):
        return jax.lax.psum(x.sum(), "data")

    per_dev = jnp.zeros((len(devs),), jnp.int32).at[0].set(local_found)
    return int(total(per_dev))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-hosts", type=int, required=True)
    p.add_argument("--host-id", type=int, required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--read", required=True)
    p.add_argument("--pml", action="store_true")
    p.add_argument("--lanes", type=int, default=32768)
    args = p.parse_args(argv)

    initialize(args.coordinator, args.num_hosts, args.host_id)

    from ..api import Index
    from ..io.fastx import iter_fastx
    from ..io.outputs import BPFWriter

    index = Index.load(args.index)
    reads = list(shard_reads(iter_fastx(args.read), args.num_hosts,
                             args.host_id))
    out = index.query_pml(reads, lanes=args.lanes)
    with BPFWriter(f"{args.read}.host{args.host_id}.pml.bpf") as w:
        for name, pmls in out:
            w.write_read(name, pmls)


if __name__ == "__main__":
    main()
