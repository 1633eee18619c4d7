"""Pallas cluster-step machinery: interpret-mode equivalence on the full
C172 flagship (the on-hardware check is tools/validate_pallas.py)."""

import jax
import jax.numpy as jnp
import pytest

from flightjax.models.c172 import flagship_sim
from flightjax.parallel.clusterstep import make_cluster_step
from flightjax.parallel.pallas_block import to_major, to_minor


@pytest.mark.parametrize("mode", ["vehicle", "subsystems", "minor", "fine"])
def test_cluster_step_matches_plain(mode):
    B = 8
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), state0)
    kw = ({"split": "subsystems", "layout": "minor"} if mode == "minor"
          else {"split": "fine", "layout": "minor"} if mode == "fine"
          else {"split": mode})
    step = make_cluster_step(sim, state, ctx, block=4, interpret=True, **kw)

    got, ref = state, state
    if mode in ("minor", "fine"):
        got = to_minor(got)
    for _ in range(2):
        got = step(got)
        # fleet_step is the semantic reference: both paths step the vehicle
        # with geoid_in_step=False and refresh the carried undulation at
        # fleet level under the same scalar `geoid_every` gate
        ref = sim.fleet_step(ref, ctx)
    if mode in ("minor", "fine"):
        got = to_major(got)

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert a.dtype == b.dtype and a.shape == b.shape
        err = float(jnp.max(jnp.abs(a.astype(jnp.float64)
                                    - b.astype(jnp.float64))))
        assert err < 1e-6, (a.dtype, err)


@pytest.mark.parametrize("layout", ["major", "minor"])
def test_cluster_step_avionics_periodic(layout):
    """Cluster step over a C172Xv1 world (gain-scheduled autopilot): the
    avionics f_periodic runs as XLA glue between kernels and its update
    must land through the batched fires-mask (leading-axis broadcast for
    batch-major leaves, trailing for batch-minor)."""
    import os

    from flightjax.core.sim import Simulation
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.models.c172.c172x_design import GAINS_PATH
    from flightjax.physics.aircraftbase import SimpleWorld

    if not os.path.exists(GAINS_PATH):
        pytest.skip("gain schedules not generated")

    B = 4
    aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=0.01, periodic_dt=0.01)
    state0, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                    periodic_dt=0.01)
    # engage SAS so f_periodic actually writes commands
    av = {"lon": dict(state0.u["avionics"]["lon"],
                      mode_req=jnp.asarray(CTL.LON_SAS, dtype=jnp.int32)),
          "lat": dict(state0.u["avionics"]["lat"],
                      mode_req=jnp.asarray(CTL.LAT_SAS, dtype=jnp.int32))}
    state0 = state0._replace(u=dict(state0.u, avionics=av))
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), state0)

    step = make_cluster_step(sim, state, (), block=2, interpret=True,
                             split="subsystems", layout=layout)

    got, ref = state, state
    if layout == "minor":
        got = to_minor(got)
    for _ in range(2):
        got = step(got)
        ref = jax.vmap(lambda s: sim.step(s, ()))(ref)
    if layout == "minor":
        got = to_major(got)

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert a.dtype == b.dtype and a.shape == b.shape
        err = float(jnp.max(jnp.abs(a.astype(jnp.float64)
                                    - b.astype(jnp.float64))))
        assert err < 1e-6, (a.dtype, err)


@pytest.mark.fast
def test_to_minor_roundtrip():
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (4,) + jnp.shape(l)), state0)
    back = to_major(to_minor(state))
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(state)):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert bool(jnp.all(a == b))
