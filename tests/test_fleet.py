"""Fleet data-parallelism tests: vmapped Monte Carlo fleets and shard_map
DP over the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172
from flightjax.parallel import fleet


@pytest.fixture(scope="module")
def c172_world_state():
    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=0.02)
    vehicle = world.aircraft.vehicle
    x, u, s, ts, rnorm = c172s.trim(vehicle)
    assert float(rnorm) < 1e-10
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    return sim, state


def test_monte_carlo_fleet_rollout(c172_world_state):
    sim, state = c172_world_state
    B = 16
    st = fleet.broadcast_state(state, B)
    st = fleet.monte_carlo_c172(st, jax.random.PRNGKey(0))

    # per-lane winds and payloads actually differ
    winds = np.asarray(st.u["vehicle"]["atm"]["wind"])
    assert np.std(winds[:, 0]) > 0.5
    fuels = np.asarray(st.x["vehicle"]["systems"]["fuel"])
    assert fuels.min() >= 0.2 and fuels.max() <= 0.9 and np.std(fuels) > 0.05

    st = fleet.fleet_rollout(sim, st, n_steps=50)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(st))
    np.testing.assert_allclose(np.asarray(st.t), 1.0, atol=1e-9)
    m = fleet.fleet_metrics(st)
    assert float(m["terminated_frac"]) == 0.0


def test_sharded_rollout(c172_world_state):
    sim, state = c172_world_state
    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide a multi-device CPU mesh"
    B = 2 * n_dev
    st = fleet.broadcast_state(state, B)
    mesh, st = fleet.shard_fleet(st)
    roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=10)
    st2, t_mean = roll(st)
    assert abs(float(t_mean) - 0.2) < 1e-9
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(st2))
