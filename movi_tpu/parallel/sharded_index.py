"""Index-sharded (capacity-scaling) PML engine.

When the index exceeds one chip's HBM, the fused record table is sharded
across a second mesh axis ('model'); read lanes stay data-parallel on
'data'.  Each scan step, every model shard gathers with the lane's global
key clamped into its local range, masks non-owned lanes to zero, and a
psum over 'model' materializes the full record -- one local gather plus
one small ICI all-reduce per step.  This is the "index sharded by run
range with collective routing" design of SURVEY.md section 5 (the
reference is single-node and has no equivalent).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..engine.fused import FusedIndex, fused_step_math


def make_2d_mesh(data: int, model: int) -> Mesh:
    devs = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def _pad_records(records: np.ndarray, model: int) -> np.ndarray:
    rows = records.shape[0]
    pad = (-rows) % model
    if pad:
        records = np.concatenate(
            [records, np.zeros((pad, records.shape[1]), records.dtype)])
    return records


def sharded_fused_pml(mesh: Mesh, fi: FusedIndex, alphas_t: np.ndarray):
    """alphas_t: int32 [W, lanes] (slot sigma = illegal).  Returns
    ml [W, lanes] computed with the record table sharded over 'model'."""
    model = mesh.shape["model"]
    records = _pad_records(np.asarray(fi.records), model)
    shard_len = records.shape[0] // model
    slots = fi.sigma + 1
    start_idx, start_off = fi.start_idx, fi.start_offset
    p_dollar = fi.p_dollar

    rec_sharding = NamedSharding(mesh, P("model", None))
    lane_sharding = NamedSharding(mesh, P(None, "data"))
    records_d = jax.device_put(jnp.asarray(records), rec_sharding)
    alphas_d = jax.device_put(jnp.asarray(alphas_t), lane_sharding)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("model", None), P(None, "data")),
             out_specs=P(None, "data"))
    def run(local_records, alphas):
        my_shard = jax.lax.axis_index("model")
        lo = my_shard * shard_len
        # derive the carry from alphas so it is marked varying over 'data'
        idx0 = jnp.full_like(alphas[0], start_idx)
        off0 = jnp.full_like(alphas[0], start_off)
        ml0 = jnp.zeros_like(alphas[0])

        def step(state, a):
            idx, offset, ml = state
            key = idx * slots + a
            local = key - lo
            owned = (local >= 0) & (local < shard_len)
            rec = jnp.take(local_records,
                           jnp.clip(local, 0, shard_len - 1), axis=0)
            rec = jnp.where(owned[:, None], rec, 0)
            rec = jax.lax.psum(rec, "model")
            return fused_step_math(rec, state, p_dollar)

        _, ml = jax.lax.scan(step, (idx0, off0, ml0), alphas)
        return ml

    return run(records_d, alphas_d)
