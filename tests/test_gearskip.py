"""Fleet-level gear gate (`landinggear.gear_gated` + `Simulation
gear_gate_margin`): when every lane is at least `margin` m above terrain,
`fleet_step` skips the strut/contact math behind a scalar `lax.cond`.

Contract: the gated step's NEXT STATE is bit-identical to the ungated
step — the airborne branch reproduces every wow=false output exactly
(zero wrench, pi_ode at the same zero input, crashed=False, frc reset);
only the logged `delta_h` diagnostic is approximated (<1e-5 m), and
fleet_step never materializes y.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.models.c172 import flagship_sim


@pytest.fixture(scope="module")
def rig():
    sim, state0, ctx = flagship_sim()
    assert sim.gear_gate_margin is not None  # flagship opts in
    B = 2
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (B,) + jnp.shape(l)), state0)
    return sim, state, ctx


def _roll(fn, state, n):
    def body(st, _):
        return fn(st), None
    return jax.lax.scan(body, state, None, length=n)[0]


def _max_err(a, b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(
            x.astype(jnp.float64) - y.astype(jnp.float64)))), a, b)))


def _sim_with_margin(sim, margin):
    return sim.replace(gear_gate_margin=margin)


def test_airborne_gate_bit_exact(rig):
    """Trimmed cruise: gate False -> airborne branch; 8-step roll must be
    bit-identical to the ungated fleet step."""
    sim, state, ctx = rig
    ungated = _sim_with_margin(sim, None)
    ref = jax.jit(lambda s: _roll(
        lambda st: ungated.fleet_step(st, ctx), s, 8))(state)
    got = jax.jit(lambda s: _roll(
        lambda st: sim.fleet_step(st, ctx), s, 8))(state)
    assert _max_err(got, ref) == 0.0


def test_forced_full_path_bit_exact(rig):
    """margin = +inf forces the gate True every step (the full branch);
    must equal the ungated step bit-for-bit."""
    sim, state, ctx = rig
    ungated = _sim_with_margin(sim, None)
    forced = _sim_with_margin(sim, 1e9)
    ref = jax.jit(lambda s: _roll(
        lambda st: ungated.fleet_step(st, ctx), s, 8))(state)
    got = jax.jit(lambda s: _roll(
        lambda st: forced.fleet_step(st, ctx), s, 8))(state)
    assert _max_err(got, ref) == 0.0


@pytest.mark.fast
def test_h_agl_and_gate_predicate(rig):
    sim, state, ctx = rig
    from flightjax.parallel.megakernel import find_vehicle
    vehicle = find_vehicle(sim.system)
    h = jax.vmap(vehicle.h_agl)(state.x["vehicle"], state.u["vehicle"],
                                state.s["vehicle"])
    # default trim point is well above the default LOWS-like terrain
    assert np.all(np.asarray(h) > 100.0)
    # consistency: h_agl == h_e - (elevation + geoid_N)
    h_e = np.asarray(state.x["vehicle"]["kinematics"]["h_e"])
    N = np.asarray(state.s["vehicle"]["geoid_N"])
    elev = float(np.asarray(
        vehicle.terrain.terrain_data(None).elevation))
    np.testing.assert_allclose(np.asarray(h), h_e - (elev + N), rtol=1e-12)


@pytest.mark.fast
def test_gear_gate_under_shard_map(rig):
    """Regression: the gear-gated fleet_step must compile and run inside
    `shard_map` (the shipped multi-chip path). The airborne branch used to
    mint mesh-REPLICATED constants while the full branch produced VARYING
    outputs, failing JAX's lax.cond vma branch-type check — fixed by
    `core.modeling.match_vma` on both branches. Result must match the
    unsharded gated step to ~1 ulp (the shard-local batch is 2 vs 4
    unsharded, so XLA's fusion/FMA grouping can differ by rounding —
    bit-exactness across different local shapes is not an XLA contract)."""
    from flightjax.parallel import fleet
    sim, state, ctx = rig
    n_dev = min(2, len(jax.devices()))
    assert n_dev >= 2, "conftest should provide a multi-device CPU mesh"
    B = 2 * n_dev
    st = jax.tree.map(
        lambda l: jnp.broadcast_to(l[:1], (B,) + jnp.shape(l)[1:]), state)

    truth = jax.jit(lambda s: _roll(
        lambda x: sim.fleet_step(x, ctx), s, 4))(st)

    mesh, sst = fleet.shard_fleet(st, devices=jax.devices()[:n_dev])
    roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=4, ctx=ctx)
    out, t_mean = roll(sst)
    assert _max_err(out, truth) < 1e-12
    np.testing.assert_allclose(float(t_mean), float(truth.t[0]), atol=0)


def test_airborne_delta_h_approx(rig):
    """The airborne branch's wheel-clearance diagnostic matches the full
    Fukushima-exact geometry to <1e-5 m at the trim state."""
    sim, state, ctx = rig
    from flightjax.parallel.megakernel import find_vehicle
    vehicle = find_vehicle(sim.system)
    ldg = vehicle.systems.ldg
    one = jax.tree.map(lambda l: l[0], state)

    x_v, u_v, s_v = one.x["vehicle"], one.u["vehicle"], one.s["vehicle"]
    kin_dot, kin = vehicle.kinematics.f_ode(
        x_v["kinematics"], x_v["dynamics"], s_v["geoid_N"], one.t)
    trn = vehicle.terrain.terrain_data(u_v["trn"], kin.n_e)

    act_y, asg, _ = vehicle.systems.act.f_ode(x_v["systems"],
                                              u_v["systems"]["act"], one.t)
    gear_u = vehicle.systems._gear_inputs(asg)
    full = ldg._strut_y_full(x_v["systems"]["ldg"], gear_u, one.t, kin, trn)
    air = ldg.strut_y_airborne(kin, trn)
    np.testing.assert_allclose(np.asarray(air.delta_h),
                               np.asarray(full.delta_h), atol=1e-5)
    assert not np.any(np.asarray(full.wow))
