"""Pod-scale serving: the fused-kernel RTI path sharded over device meshes.

BASELINE.json config 5 ("100k+ scenarios sharded across N>=2 hosts"): the
batch axis is embarrassingly parallel, so the pod path is `shard_map` over
the mesh's batch axis with each device running the *fused Pallas* RTI step
(`solver.rti_step_batched`) on its local shard — kernels ride each chip's
VMEM, nothing crosses ICI during a solve, and only user-requested metric
reductions (`psum`/`pmax`) communicate.  Multi-host runs initialize with
`init_distributed()` (jax.distributed) and shard the global batch over
(hosts x chips); DCN never sees solver state.

The horizon axis composes on top via `sharded.stage_sharded_rti_step`
(collective-reduced partial condensing over STAGE_AXIS) when N is scaled
past single-chip VMEM — the two axes are the same mesh's dimensions
(parallel.mesh.make_mesh).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from crazyflie_nmpc_tpu.ops import ipm
from crazyflie_nmpc_tpu.parallel.mesh import BATCH_AXIS
from crazyflie_nmpc_tpu.solver.ocp import OCPSpec
from crazyflie_nmpc_tpu.solver.rti_batched import rti_step_batched


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize multi-host JAX (jax.distributed) if not already done.

    On a real pod, TPU runtime env vars make all arguments optional; on a
    CPU fake cluster pass them explicitly (the standard XLA trick for
    testing multi-node without a cluster, SURVEY.md §4).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized
    return jax.process_count(), jax.process_index()


def pod_rti_step(spec: OCPSpec, mesh,
                 config: ipm.IPMConfig = ipm.IPMConfig(),
                 block_b: int = 128, stages_per_step: int = 25,
                 interpret: bool = False, condense: int | None = None):
    """Jitted pod-wide RTI step on the fused-kernel path.

    Returns fn(states, x0s, yref, yref_e) -> (states', outs).  Batch-first
    global arrays, sharded over the mesh's batch axis; yref/yref_e are
    replicated (shared reference) or batch-sharded (per-problem).  Each
    device runs the Pallas kernels on its local shard; no collectives in
    the solve itself.

    condense defaults to block-2 partial condensing when the horizon is
    even (the fastest measured serving configuration; see
    ops/pallas/condensed_kernels.py).
    """
    from jax import shard_map

    if condense is None:
        condense = 2 if spec.N % 2 == 0 else 1
    n_batch_dev = mesh.shape[BATCH_AXIS]

    def local_step(states, x0s, yref, yref_e):
        new_states, outs = rti_step_batched(
            spec, states, x0s, yref, yref_e, config,
            block_b=block_b, stages_per_step=stages_per_step,
            interpret=interpret, condense=condense)
        return new_states, outs

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(), P()),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
        check_vma=False,
    )

    batch_sharding = NamedSharding(mesh, P(BATCH_AXIS))

    @jax.jit
    def step(states, x0s, yref, yref_e):
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
        return sharded(states, x0s, yref, yref_e)

    del n_batch_dev
    return step


def fleet_metrics(mesh):
    """Pod-wide telemetry reduction: worst KKT residual and mean QP gap
    across all shards (the 'solver-status surfaced per batch element'
    plane of SURVEY.md §5, reduced for dashboards)."""
    from jax import shard_map

    def local(kkt, mu):
        return (jax.lax.pmax(jnp.max(kkt), BATCH_AXIS),
                jax.lax.pmean(jnp.mean(mu), BATCH_AXIS))

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    ))
