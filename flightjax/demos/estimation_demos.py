"""Sensors + state-estimation demo: a full avionics navigation loop on
the C172.

No reference counterpart — Flight.jl's avionics consume the true
`KinData` directly (`aircraftbase.jl:201-210`); there is no sensor layer
and no filter. flightjax closes the realistic loop:

    truth (6-DOF physics) -> SensorSuite (IMU/pitot/baro/GPS/mag noise,
    biases, random walks) -> Ahrs EKF -> attitude estimate

and, being pure JAX end to end, the whole pipeline vmaps over Monte
Carlo fleets: `fleet_navigation_study()` flies N noisy-sensor lanes of
the same trajectory and reports the attitude-error distribution — the
certification-style question "what fraction of this sensor grade keeps
attitude error under X deg" in one batched program.

    result = navigation_demo()          # single lane, ~1 min on CPU
    stats = fleet_navigation_study(64)  # 64-lane MC, a few minutes
    joint = joint_navigation_study(32)  # turbulence x sensor grade,
                                        # closed-loop on estimates
    fdi = fdi_mission_demo()            # fleet fault-detection mission
"""

import jax
import jax.numpy as jnp

from flightjax.physics.sensors import SensorSuite, measure_trajectory
from flightjax.utils.estimation import Ahrs, attitude_error_deg


def _truth_trajectory(t_end=30.0, dt=0.02):
    """Trimmed C172S flight with a small elevator doublet: (kin, air,
    dyn) stacks plus the terrain elevation under the track (the radar
    altimeter's ground reference — plumbed to `measure_trajectory` so
    AGL readings are terrain-referenced, not sea-level-referenced)."""
    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.c172 import c172s, common as C172

    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=dt)
    vehicle = world.aircraft.vehicle
    x, u, s, _, _ = c172s.trim(vehicle, C172.trim_parameters())
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    _, log = sim.run(state, t_end=t_end, save_y=True)
    y = log.y.vehicle
    h_trn = vehicle.terrain.terrain_data(u["trn"],
                                         y.kinematics.n_e).elevation
    return log.t, y.kinematics, y.airflow, y.dynamics, h_trn


def navigation_demo(t_end=30.0, dt=0.02, seed=0):
    """One lane: fly, sense, filter. Returns a dict with the truth and
    estimated attitude histories and summary errors [deg]."""
    t, kins, airs, dyns, h_trn = _truth_trajectory(t_end, dt)

    suite = SensorSuite(dt=dt)
    u = {"seed": jnp.asarray(seed, jnp.int32), "params": suite.init_u()["params"]}
    s0 = suite.init_s(u, init_key=jax.random.PRNGKey(seed))
    zs, _ = measure_trajectory(suite, u, s0, kins, airs, dyns, h_trn=h_trn)

    ahrs = Ahrs(dt=dt)
    st0 = ahrs.init(q_nb=kins.q_nb[0])
    st, q_hist = ahrs.run(st0, zs.omega_b, zs.f_b, zs.mag_b)
    err = attitude_error_deg(q_hist, kins.q_nb)
    return {"t": t, "q_true": kins.q_nb, "q_est": q_hist,
            "err_deg": err, "err_final_deg": float(err[-1]),
            "err_max_deg": float(jnp.max(err)),
            "gyro_bias_est": st.b_g, "sensors": zs}


def fleet_navigation_study(n_lanes=64, t_end=30.0, dt=0.02,
                           err_budget_deg=2.0):
    """Monte Carlo over sensor realizations: N lanes share one truth
    trajectory (sensor noise, not airframe scatter, is the study axis)
    but draw independent noise streams and turn-on biases. Returns the
    per-lane final/max attitude errors and the fraction inside the error
    budget. For the joint trajectory x sensor-grade study, see
    `joint_navigation_study`."""
    _, kins, airs, dyns, h_trn = _truth_trajectory(t_end, dt)
    suite = SensorSuite(dt=dt)
    params = suite.init_u()["params"]
    ahrs = Ahrs(dt=dt)
    q0 = kins.q_nb[0]

    def lane(seed):
        u = {"seed": seed, "params": params}
        s0 = suite.init_s(
            u, init_key=jax.random.fold_in(jax.random.PRNGKey(0xA77), seed))
        zs, _ = measure_trajectory(suite, u, s0, kins, airs, dyns,
                                   h_trn=h_trn)
        st, q_hist = ahrs.run(ahrs.init(q_nb=q0), zs.omega_b, zs.f_b,
                              zs.mag_b)
        err = attitude_error_deg(q_hist, kins.q_nb)
        return err[-1], jnp.max(err)

    seeds = jnp.arange(n_lanes, dtype=jnp.int32)
    err_final, err_max = jax.jit(jax.vmap(lane))(seeds)
    within = jnp.mean((err_max < err_budget_deg).astype(jnp.float32))
    return {"err_final_deg": err_final, "err_max_deg": err_max,
            "frac_within_budget": float(within),
            "p95_max_err_deg": float(jnp.percentile(err_max, 95.0))}


# ---------------------------------------------------------------------------
# Joint trajectory x sensor-grade navigation Monte Carlo (VERDICT r3 #6)

def nav_fleet_setup(n_lanes=32, dt=0.02, W20_max=7.7, grade_range=(0.5, 2.0),
                    key=None, use_estimates=True):
    """Closed-loop nav fleet with JOINTLY randomized conditions: per-lane
    Dryden severity (W20 ~ U[0, W20_max]) + `monte_carlo_c172` winds /
    payload / fuel, per-lane sensor grade (IMU noise scale ~
    U[grade_range]) and independent sensor streams. Each lane flies the
    C172X turning climb on its OWN estimated states
    (`physics.navigation.NavAvionics`) through its OWN turbulence — the
    joint study the fleet machinery exists for. Returns (sim, state).

    Deliberate robustness axis: each lane's IMU noise is scaled by its
    grade, but the per-lane filter Q/R stay at the catalog (grade-1.0)
    values frozen at NavAvionics construction — high-grade-noise lanes
    run a knowingly optimistic filter, exactly the mistuning a fielded
    filter carries against unit-to-unit sensor spread. The FDI monitors
    must NOT false-latch under it; `joint_navigation_study` reports the
    measured alarm fractions and its test asserts they stay zero."""
    from flightjax.core.sim import Simulation
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.parallel import fleet
    from flightjax.physics.aircraftbase import SimpleWorld
    from flightjax.physics.sensors import pressure_altitude
    from flightjax.physics.turbulence import DrydenTurbulence

    key = jax.random.PRNGKey(0x17A) if key is None else key
    aircraft = c172x.build_xv1_nav("wa", periodic_dt=dt,
                                   use_estimates=use_estimates,
                                   turbulence=DrydenTurbulence(dt))
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=dt, periodic_dt=dt)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                   periodic_dt=dt)

    # engage the turning climb
    av = dict(state.u["avionics"])
    inner = {"lon": dict(av["inner"]["lon"]), "lat": dict(av["inner"]["lat"])}
    inner["lon"].update(mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
                        EAS_ref=jnp.asarray(45.0), clm_ref=jnp.asarray(1.5))
    inner["lat"].update(mode_req=jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32),
                        chi_ref=jnp.asarray(jnp.pi / 2))
    av["inner"] = inner
    state = state._replace(u=dict(state.u, avionics=av))

    st = fleet.broadcast_state(state, n_lanes)
    k_mc, k_w20, k_grade, k_seed = jax.random.split(key, 4)
    st = fleet.monte_carlo_c172(st, k_mc, wind_std=3.0, h_jitter=30.0)

    veh_u = dict(st.u["vehicle"])
    veh_u["turb"] = dict(veh_u["turb"], W20=jax.random.uniform(
        k_w20, (n_lanes,), minval=0.0, maxval=W20_max))
    av_u = dict(st.u["avionics"])
    grade = jax.random.uniform(k_grade, (n_lanes,), minval=grade_range[0],
                               maxval=grade_range[1])
    # per-lane sensor grade: scale the (already lane-broadcast) IMU noise
    # leaves; grade has shape (B,), the leaves (B,) or (B, 3)
    params = dict(av_u["sens"]["params"])
    imu = dict(params["imu"])
    for k in ("sigma_gyro", "sigma_accel", "rw_gyro", "rw_accel"):
        imu[k] = imu[k] * grade
    params["imu"] = imu
    av_u["sens"] = dict(av_u["sens"], params=params,
                        seed=jax.random.randint(k_seed, (n_lanes,), 0,
                                                2**31 - 1, jnp.int32))

    # re-align each lane's filter origin at its jittered altitude: the
    # INS starts at p_n = 0, so h0/baro_datum must be the LANE's own fix
    qnh_scalar = state.u["avionics"]["sens"]["params"]["baro"]["qnh"]

    def realign(x_v, u_v, s_v, org):
        _, y = aircraft.vehicle.f_ode(x_v, u_v, s_v, 0.0)
        kin, air = y.kinematics, y.airflow
        datum = (pressure_altitude(air.p) - pressure_altitude(qnh_scalar)
                 - kin.h_e)
        return dict(org, lat0=kin.lat, lon0=kin.lon, h0=kin.h_e,
                    baro_datum=datum)

    av_u["origin"] = jax.vmap(realign)(
        st.x["vehicle"], st.u["vehicle"], st.s["vehicle"], av_u["origin"])
    st = st._replace(u=dict(st.u, vehicle=veh_u, avionics=av_u))
    return sim, st


def fleet_rollout_nav_errors(sim, state, n_steps, sample_every=10):
    """Roll a nav-avionics fleet while tracking each lane's peak
    attitude-estimate error [deg] and horizontal position-estimate error
    [m] — the navigation counterpart of `fleet.fleet_rollout_loads`.
    Returns (final_state, peak_att_deg, peak_pos_m)."""
    from flightjax.utils.estimation import ned_from_geodetic

    n_outer, rem = divmod(int(n_steps), int(sample_every))
    if rem:
        raise ValueError("n_steps must be a multiple of sample_every")

    def errors(st):
        def one(st1):
            y = sim.output(st1, ())
            kin = y.vehicle.kinematics
            nav = y.avionics["nav"]
            org = st1.u["avionics"]["origin"]
            att = attitude_error_deg(nav["q_nb"], kin.q_nb)
            p_true = ned_from_geodetic(kin.lat, kin.lon, kin.h_e,
                                       org["lat0"], org["lon0"], org["h0"])
            pos = jnp.linalg.norm(nav["p_n"][:2] - p_true[:2])
            return att, pos
        return jax.vmap(one)(st)

    @jax.jit
    def roll(st):
        def inner(s, _):
            return sim.fleet_step(s, ()), None

        def outer(carry, _):
            s, pa, pp = carry
            s, _ = jax.lax.scan(inner, s, None, length=sample_every)
            att, pos = errors(s)
            return (s, jnp.maximum(pa, att), jnp.maximum(pp, pos)), None

        a0, p0 = errors(st)
        (s, pa, pp), _ = jax.lax.scan(outer, (st, a0, p0), None,
                                      length=n_outer)
        return s, pa, pp

    return roll(state)


def joint_navigation_study(n_lanes=32, t_end=30.0, dt=0.02,
                           att_thresholds=(0.5, 1.0, 2.0, 5.0),
                           pos_thresholds=(2.0, 5.0, 10.0, 25.0),
                           key=None):
    """The certification-style joint Monte Carlo: turbulence severity x
    maneuver randomization x sensor grade, each lane flying closed-loop
    on its own estimates, reporting navigation-error exceedance the same
    way the gust-load study reports load exceedance
    (`fleet.exceedance`)."""
    from flightjax.parallel import fleet

    sim, st = nav_fleet_setup(n_lanes, dt, key=key)
    n_steps = int(round(t_end / dt))
    final, peak_att, peak_pos = fleet_rollout_nav_errors(
        sim, st, n_steps, sample_every=10)
    # FDI health under the deliberate filter/truth grade mismatch (see
    # nav_fleet_setup): fraction of lanes with a latched alarm, per
    # channel — all healthy-sensor lanes, so anything nonzero is a
    # false alarm
    s_av = final.s["avionics"]
    alarm_frac = {
        name: float(jnp.mean(s_av[mon]["alarm"].astype(jnp.float32)))
        for name, mon in (("gps", "mon_gps"), ("gps_vel", "mon_vel"),
                          ("baro", "mon_baro"), ("mag", "mon_mag"))}
    return {
        "peak_att_deg": peak_att, "peak_pos_m": peak_pos,
        "att_exceedance": fleet.exceedance(peak_att, att_thresholds),
        "pos_exceedance": fleet.exceedance(peak_pos, pos_thresholds),
        "p95_att_deg": float(jnp.percentile(peak_att, 95.0)),
        "p95_pos_m": float(jnp.percentile(peak_pos, 95.0)),
        "alarm_fraction": alarm_frac,
    }


if __name__ == "__main__":
    r = navigation_demo()
    print(f"single lane: max err {r['err_max_deg']:.3f} deg, "
          f"final {r['err_final_deg']:.3f} deg, "
          f"bias est {r['gyro_bias_est']}")
    s = fleet_navigation_study(16)
    print(f"fleet(16): p95 max err {s['p95_max_err_deg']:.3f} deg, "
          f"{100 * s['frac_within_budget']:.0f}% within budget")


def fdi_mission_demo(n_lanes=8, n_faulted=4, t_end=20.0, dt=0.02,
                     fault_t=10.0):
    """Fleet-scale fault-detection mission (the in-loop counterpart of
    the certification question "will the avionics notice a frozen
    GPS?"): `n_lanes` C172Xs fly the turning climb on their own
    estimates; lanes [n_lanes - n_faulted:] suffer a GPS freeze at
    `fault_t`. Returns per-lane alarm flags (faulted lanes must alarm,
    healthy lanes must not — asserted at fleet scale on the mesh in
    `tests/test_navigation.py::test_fleet_fdi_mission_on_virtual_mesh`)
    plus altitude-estimate errors showing the coast response."""
    from flightjax.core.sim import Simulation
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.parallel import fleet
    from flightjax.physics import navigation as NAV
    from flightjax.physics.aircraftbase import SimpleWorld

    aircraft = c172x.build_xv1_nav("wa", periodic_dt=dt)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=dt, periodic_dt=dt)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                   periodic_dt=dt)
    av = dict(state.u["avionics"])
    inner = {"lon": dict(av["inner"]["lon"]), "lat": dict(av["inner"]["lat"])}
    inner["lon"].update(mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
                        EAS_ref=jnp.asarray(45.0), clm_ref=jnp.asarray(1.5))
    inner["lat"].update(mode_req=jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32),
                        chi_ref=jnp.asarray(jnp.pi / 2))
    av["inner"] = inner
    state = state._replace(u=dict(state.u, avionics=av))

    st = fleet.broadcast_state(state, n_lanes)
    av_u = dict(st.u["avionics"])
    av_u["sens"] = dict(av_u["sens"],
                        seed=jnp.arange(n_lanes, dtype=jnp.int32))
    faulted = jnp.arange(n_lanes) >= (n_lanes - n_faulted)
    k0 = jnp.where(faulted, int(round(fault_t / dt)),
                   NAV._NEVER).astype(jnp.int32)
    av_u["fault"] = dict(
        NAV.no_fault(),
        channel=jnp.full(n_lanes, NAV.FAULT_GPS, jnp.int32),
        mode=jnp.full(n_lanes, NAV.MODE_FREEZE, jnp.int32),
        k0=k0, k1=jnp.full(n_lanes, NAV._NEVER, jnp.int32),
        delta=jnp.zeros(n_lanes))
    st = st._replace(u=dict(st.u, avionics=av_u))

    out = fleet.fleet_rollout(sim, st, n_steps=int(round(t_end / dt)))
    y = jax.vmap(lambda s: sim.output(s, ()))(out)
    alarms = out.s["avionics"]["mon_gps"]["alarm"]
    h_err = jnp.abs(y.avionics["nav"]["h_est"]
                    - y.vehicle.kinematics.h_e)
    return {"faulted": faulted, "gps_alarm": alarms, "h_err_m": h_err,
            "detection_correct": bool(jnp.all(alarms == faulted))}
