"""Multi-host (DCN) fleet scaling: `jax.distributed` wiring.

SURVEY.md §2.5: within one pod slice the fleet shards over ICI via
`shard_map` (`fleet.sharded_rollout_fn`); across hosts the SAME code scales
over DCN once each process has called `initialize()` — jax then presents
one global device list and inserts cross-host collectives where the mesh
spans processes.

Pod-slice recipe (one process per host, e.g. via the TPU VM launcher):

    from flightjax.parallel import distributed, fleet

    distributed.initialize()            # TPU pods: all args auto-detected
    mesh = distributed.global_fleet_mesh()
    gstate = distributed.make_global_fleet(local_state, mesh)
    roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=1000)
    gstate, t_mean = roll(gstate)       # per-shard physics local,
                                        # pmean over ICI+DCN

On CPU hosts (tests, dev boxes) pass coordinator/process counts explicitly;
`tests/test_distributed.py` proves the composition with two processes x 4
virtual CPU devices each.
"""

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kw):
    """`jax.distributed.initialize` passthrough. On TPU pods every argument
    is auto-detected from the environment; on CPU/GPU fleets pass
    `coordinator_address="host:port"`, `num_processes`, `process_id`.
    Safe to call once per process, before any jax computation."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_fleet_mesh(axis="dp"):
    """1-D mesh over ALL global devices (every process's chips). Fleet DP
    is the only sharded axis — per-vehicle state is a few hundred scalars,
    so there is nothing to cut tensor/pipeline-wise (SURVEY.md §2.5)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def make_global_fleet(local_state, mesh, axis="dp"):
    """Assemble per-process local fleet states into one globally-sharded
    SimState: each process contributes its own `local_state` (leading axis
    = its local lanes); the result is a global array tree of
    `num_processes * local_batch` lanes sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def assemble(leaf):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(leaf))

    return jax.tree.map(assemble, local_state)


def process_local_lanes(global_state):
    """The lanes of a globally-sharded fleet state owned by THIS process,
    as host numpy (for per-host IO: logging, X-Plane bridges, checkpoints)."""
    def local(leaf):
        # sort by global lane index: addressable_shards enumerates in device
        # order, which need not follow ascending lane index on a reordered
        # mesh — unsorted concatenation would silently attribute IO to the
        # wrong vehicles
        shards = sorted(leaf.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0) \
            if shards else np.asarray(leaf)

    return jax.tree.map(local, global_state)
