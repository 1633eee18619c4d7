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
"""

import jax
import jax.numpy as jnp

from flightjax.physics.sensors import SensorSuite, measure_trajectory
from flightjax.utils.estimation import Ahrs, attitude_error_deg


def _truth_trajectory(t_end=30.0, dt=0.02):
    """Trimmed C172S flight with a small elevator doublet: (kin, air,
    dyn) stacks plus the Simulation for reuse."""
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
    return log.t, y.kinematics, y.airflow, y.dynamics


def navigation_demo(t_end=30.0, dt=0.02, seed=0):
    """One lane: fly, sense, filter. Returns a dict with the truth and
    estimated attitude histories and summary errors [deg]."""
    t, kins, airs, dyns = _truth_trajectory(t_end, dt)

    suite = SensorSuite(dt=dt)
    u = {"seed": jnp.asarray(seed, jnp.int32), "params": suite.init_u()["params"]}
    s0 = suite.init_s(u, init_key=jax.random.PRNGKey(seed))
    zs, _ = measure_trajectory(suite, u, s0, kins, airs, dyns)

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
    budget."""
    _, kins, airs, dyns = _truth_trajectory(t_end, dt)
    suite = SensorSuite(dt=dt)
    params = suite.init_u()["params"]
    ahrs = Ahrs(dt=dt)
    q0 = kins.q_nb[0]

    def lane(seed):
        u = {"seed": seed, "params": params}
        s0 = suite.init_s(
            u, init_key=jax.random.fold_in(jax.random.PRNGKey(0xA77), seed))
        zs, _ = measure_trajectory(suite, u, s0, kins, airs, dyns)
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


if __name__ == "__main__":
    r = navigation_demo()
    print(f"single lane: max err {r['err_max_deg']:.3f} deg, "
          f"final {r['err_final_deg']:.3f} deg, "
          f"bias est {r['gyro_bias_est']}")
    s = fleet_navigation_study(16)
    print(f"fleet(16): p95 max err {s['p95_max_err_deg']:.3f} deg, "
          f"{100 * s['frac_within_budget']:.0f}% within budget")
