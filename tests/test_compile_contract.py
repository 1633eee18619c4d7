"""Zero-recompilation contract — the TPU analog of the reference's
allocation-free `@ballocated == 0` assertions (`test_c172x1.jl:82-86`,
`test_world.jl:23-25`; SURVEY.md §4.1).

The hot step must jit-compile exactly once and then be pure data flow:
new state values, changed control references, and autopilot mode requests
are all array *data* (int32/float fields of the carry), never trace-time
structure, so none of them may trigger a retrace.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from flightjax.core.sim import Simulation, SimState


def _cache_size(fn):
    return fn._cache_size()


@pytest.mark.fast
def test_robot2d_step_compiles_once():
    from flightjax.models.robot2d import Robot

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.init()
    step = jax.jit(lambda st: sim.step(st, ()))

    for _ in range(5):
        state = step(state)
    # perturb a control reference (data, not structure) and keep stepping
    u_ctl = dict(state.u["ctl"])
    u_ctl["v_ref"] = u_ctl["v_ref"] + 0.3
    state = state._replace(u=dict(state.u, ctl=u_ctl))
    for _ in range(5):
        state = step(state)

    assert _cache_size(step) == 1
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree.leaves(state.x))


def test_c172_flagship_step_compiles_once():
    from flightjax.models.c172 import flagship_sim

    sim, state, ctx = flagship_sim()
    step = jax.jit(lambda st: sim.step(st, ctx))

    for _ in range(3):
        state = step(state)
    # elevator input change = data
    act = dict(state.u["vehicle"]["systems"]["act"])
    act["elevator"] = act["elevator"] + 0.1
    uv = dict(state.u["vehicle"],
              systems=dict(state.u["vehicle"]["systems"], act=act))
    state = state._replace(u=dict(state.u, vehicle=uv))
    for _ in range(3):
        state = step(state)

    assert _cache_size(step) == 1


def test_c172xv1_mode_switch_no_retrace():
    """Autopilot mode requests are int32 carry data: switching modes mid-run
    must not recompile (the reference's analog: every mode's f_periodic! is
    allocation-free, `test_c172x1.jl:114,141`)."""
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.models.c172.c172x_design import GAINS_PATH
    from flightjax.physics.aircraftbase import SimpleWorld

    if not os.path.exists(GAINS_PATH):
        pytest.skip("gain schedules not generated")

    aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=0.01, periodic_dt=0.01)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                   periodic_dt=0.01)
    step = jax.jit(lambda st: sim.step(st, ()))

    for mode_lon, mode_lat in ((CTL.LON_DIRECT, CTL.LAT_DIRECT),
                               (CTL.LON_SAS, CTL.LAT_SAS),
                               (CTL.LON_EAS_ALT, CTL.LAT_CHI_BETA)):
        av = {"lon": dict(state.u["avionics"]["lon"],
                          mode_req=jnp.asarray(mode_lon, dtype=jnp.int32)),
              "lat": dict(state.u["avionics"]["lat"],
                          mode_req=jnp.asarray(mode_lat, dtype=jnp.int32))}
        state = state._replace(u=dict(state.u, avionics=av))
        for _ in range(3):
            state = step(state)

    assert _cache_size(step) == 1


def test_run_reuses_executable_across_calls():
    """`Simulation.run` must not re-trace on repeated calls: the block-scan
    closures are cached per (save_every, save_y, unroll) on the Simulation,
    with ctx as a traced argument. A second run over the same shapes — and
    runs from the returned (matching-shape) state — must hit the same
    compiled executable."""
    from flightjax.models.robot2d import Robot

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state0 = sim.init()

    st1, log1 = sim.run(state0, t_end=1.0, t0=0.0, save_every=10)
    st2, log2 = sim.run(state0, t_end=1.0, t0=0.0, save_every=10)
    # continue from the final state: same shapes, same k -> same executable
    st3, _ = sim.run(st1, t_end=2.0, t0=1.0, save_every=10)

    scan_blocks = sim._run_cache[("blocks", 10, True, 1)]
    assert _cache_size(scan_blocks) == 1

    # identical inputs must give bit-identical trajectories
    assert jnp.array_equal(log1.t, log2.t)
    for a, b in zip(jax.tree.leaves(log1.y), jax.tree.leaves(log2.y)):
        assert jnp.array_equal(a, b)

    # a different k (block count) recompiles; a repeat of it does not
    sim.run(state0, t_end=0.5, t0=0.0, save_every=10)
    sim.run(state0, t_end=0.5, t0=0.0, save_every=10)
    assert _cache_size(scan_blocks) == 2
