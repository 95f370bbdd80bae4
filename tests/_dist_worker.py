"""Worker process for the multi-host (fake pod) test.

Launched by tests/test_distributed.py: N processes x 2 virtual CPU devices
each form one global JAX program (jax.distributed + Gloo CPU collectives —
the standard trick for testing multi-node without a cluster, SURVEY.md §4).
Each worker runs one pod-wide RTI step on its shard of a global swarm batch
and writes its local u0 shard to disk for the parent to reassemble.
"""

import os
import sys


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    outdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from crazyflie_nmpc_tpu.parallel.pod import init_distributed

    nglobal, _ = init_distributed(coordinator=f"127.0.0.1:{port}",
                                  num_processes=nproc, process_id=rank)
    assert nglobal == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from crazyflie_nmpc_tpu.models import NX, hover_state
    from crazyflie_nmpc_tpu.ops.ipm import IPMConfig
    from crazyflie_nmpc_tpu.parallel import make_mesh
    from crazyflie_nmpc_tpu.parallel.mesh import BATCH_AXIS
    from crazyflie_nmpc_tpu.parallel.pod import fleet_metrics, pod_rti_step
    from crazyflie_nmpc_tpu.solver import default_ocp, hover_yref, init_rti

    n_dev = len(jax.devices())            # nproc * 2 virtual devices
    mesh = make_mesh(batch=n_dev, stage=1)
    spec = default_ocp(N=10, dtype=jnp.float32)
    yref, yref_e = hover_yref(spec)

    B = 2 * n_dev
    per_proc = B // nproc
    # deterministic global problem, identical on every rank
    key = jax.random.PRNGKey(42)
    x0s_np = np.asarray(
        hover_state(spec.params, dtype=jnp.float32)[None, :]
        + 0.04 * jax.random.normal(key, (B, NX), jnp.float32))
    states_np = jax.tree.map(
        np.asarray, jax.vmap(lambda x: init_rti(spec, jnp.asarray(x)))(
            jnp.asarray(x0s_np)))

    sh = NamedSharding(mesh, P(BATCH_AXIS))
    lo, hi = rank * per_proc, (rank + 1) * per_proc

    def globalize(arr):
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(arr[lo:hi]), arr.shape)

    x0s = globalize(x0s_np)
    states = jax.tree.map(globalize, states_np)

    step = pod_rti_step(spec, mesh, IPMConfig(iters=6), block_b=2,
                        stages_per_step=5, interpret=True)
    new_states, outs = step(states, x0s, jnp.asarray(yref),
                            jnp.asarray(yref_e))

    # pod-wide telemetry reduction crosses the process boundary (Gloo)
    kkt_max, mu_mean = fleet_metrics(mesh)(outs.kkt_res, outs.qp_mu)

    local_rows = []
    for shard in outs.u0.addressable_shards:
        local_rows.append((shard.index[0].start or 0, np.asarray(shard.data)))
    local_rows.sort(key=lambda t: t[0])
    u0_local = np.concatenate([r for _, r in local_rows], axis=0)
    np.save(os.path.join(outdir, f"u0_rank{rank}.npy"), u0_local)
    np.save(os.path.join(outdir, f"kkt_rank{rank}.npy"),
            np.array([float(kkt_max), float(mu_mean)]))
    print(f"rank {rank}: OK devices={n_dev} u0_local={u0_local.shape}",
          flush=True)


if __name__ == "__main__":
    main()
