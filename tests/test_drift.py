"""Trajectory comparability gate (BASELINE.md: <1e-6 state agreement at
t = 10 s).

The Julia reference cannot run in this image, so the gate is enforced as
cross-mechanization agreement: WA, ECEF and NED are three independent
kinematic formulations of the same physics (different state vectors,
different transport-rate equations, different renormalizations). Agreement
of all three to <1e-6 over a 10 s elevator-step flight in float64 bounds
the implementation error of the whole stack (geodesy, kinematics, dynamics,
aero, engine, integration order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172
from flightjax.physics.aircraftbase import SimpleWorld


def fly(kinematics, ts, tp, t_end=10.0):
    world = c172s.flagship_world(kinematics)
    sim = Simulation(world, dt=0.02)
    vehicle = world.aircraft.vehicle
    x, u, s = c172s.trim_assign(vehicle, tp, ts)
    # elevator step from trim
    act = dict(u["systems"]["act"])
    act["elevator"] = act["elevator"] + 0.1
    u = dict(u, systems=dict(u["systems"], act=act))
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    final, _ = sim.run(state, t_end=t_end, save_y=False)
    _, y = vehicle.f_ode(final.x["vehicle"], final.u["vehicle"],
                         final.s["vehicle"], t_end)
    return y


@pytest.fixture(scope="module")
def trajectories():
    # shared trim state computed once (on the WA vehicle)
    vehicle = c172s.build_vehicle("wa")
    tp = C172.trim_parameters()
    _, _, _, ts, rnorm = c172s.trim(vehicle, tp)
    assert float(rnorm) < 1e-10
    return {k: fly(k, ts, tp) for k in ("wa", "ecef", "ned")}


def test_mechanization_agreement_10s(trajectories):
    ys = trajectories
    ref = ys["wa"]
    for name in ("ecef", "ned"):
        y = ys[name]
        # position: ECEF cartesian to 1e-6 m
        np.testing.assert_allclose(np.asarray(y.kinematics.r_eb_e),
                                   np.asarray(ref.kinematics.r_eb_e),
                                   atol=1e-6, err_msg=name)
        # velocity: body axes to 1e-8 m/s
        np.testing.assert_allclose(np.asarray(y.kinematics.v_eb_b),
                                   np.asarray(ref.kinematics.v_eb_b),
                                   atol=1e-8, err_msg=name)
        # attitude: quaternion to 1e-9
        q, qr = np.asarray(y.kinematics.q_nb), np.asarray(ref.kinematics.q_nb)
        q = q * np.sign(np.dot(q, qr))
        np.testing.assert_allclose(q, qr, atol=1e-9, err_msg=name)
        # rates
        np.testing.assert_allclose(np.asarray(y.kinematics.omega_eb_b),
                                   np.asarray(ref.kinematics.omega_eb_b),
                                   atol=1e-10, err_msg=name)


def test_f32_drift_documented(trajectories):
    """f32 (the TPU fast path) vs f64 drift at 10 s stays within the
    documented accuracy envelope for throughput runs: < 5 m absolute
    position, < 0.05 m/s velocity. The f32 leg runs with compensated
    (Kahan) position accumulation (`core.sim.comp_add`), which cuts the
    absolute-position random walk from ~63 m to ~0.7 m at 10 s (measured,
    tools/exp_f32_comp.py). It runs in a subprocess without x64 (enabling
    x64 in-process silently promotes constants)."""
    import json
    import subprocess
    import sys

    ref = trajectories["wa"]
    vehicle = c172s.build_vehicle("wa")
    tp = C172.trim_parameters()
    _, _, _, ts, _ = c172s.trim(vehicle, tp)
    ts_vals = [float(v) for v in ts]

    code = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import json
import jax.numpy as jnp
import numpy as np
from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172

tp = C172.trim_parameters()
ts = C172.TrimState(*[jnp.asarray(v) for v in {ts_vals!r}])
world = c172s.flagship_world('wa')
sim = Simulation(world, dt=0.02)
x, u, s = c172s.trim_assign(world.aircraft.vehicle, tp, ts)
act = dict(u['systems']['act'])
act['elevator'] = act['elevator'] + 0.1
u = dict(u, systems=dict(u['systems'], act=act))
state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                 x={{'vehicle': x}}, u={{'vehicle': u}},
                 s={{'vehicle': s, 'terminated': jnp.asarray(False)}})
state = sim.with_compensation(state)
final, _ = sim.run(state, t_end=10.0, save_y=False)
_, y = world.aircraft.vehicle.f_ode(final.x['vehicle'], final.u['vehicle'],
                                    final.s['vehicle'], 10.0)
print('RESULT', json.dumps(dict(
    r=np.asarray(y.kinematics.r_eb_e, dtype=np.float64).tolist(),
    v=np.asarray(y.kinematics.v_eb_b, dtype=np.float64).tolist())))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200, cwd=".")
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert line, out.stderr[-2000:]
    res = json.loads(line[0][7:])

    dr = np.asarray(res["r"]) - np.asarray(ref.kinematics.r_eb_e)
    dv = np.asarray(res["v"]) - np.asarray(ref.kinematics.v_eb_b)
    # f32 envelope (measured): velocity/altitude/attitude essentially exact
    # (dTAS ~1e-4 m/s, dh ~1e-2 m at 10 s). Without compensation, ABSOLUTE
    # geodetic position random-walks at ~1 m/s of flight: the per-step
    # position-quaternion increment (~8e-9 rad) sits below the f32 ulp of a
    # unit quaternion component (6e-8), the classic single-precision INS
    # limitation. Kahan-compensated accumulation of the position states
    # (q_ew/h_e carried as value+residual pairs) recovers the sub-ulp
    # increments: 0.73 m at 10 s vs 63 m uncompensated (exp_f32_comp.py).
    assert np.linalg.norm(dv) < 0.05, dv
    assert np.linalg.norm(dr) < 5.0, dr


@pytest.mark.slow
def test_f32_envelope_600s_cruise():
    """The f32 fast path's accuracy envelope at the ADVERTISED mission
    horizon (600 s — the turning-climb / Monte Carlo workloads,
    BASELINE.md rows 3-4), not just the 10 s gate above. Measured
    2026-08-19 (tools/exp_f32_comp.py, trimmed cruise, CPU f32 legs vs
    CPU f64):

        comp=True : |dr| = 21.8 m, |dv| = 1.1e-3 m/s,
                    attitude 1.9e-3 rad, EAS 1.1e-3 m/s
        comp=False: |dr| = 753 m (the uncompensated random walk)

    Bound: < 50 m position, < 0.01 m/s velocity, < 0.01 rad attitude at
    600 s with compensation on (the flagship_sim configuration).
    Reference semantics anchor: `kinematics.jl:181-229` (renorm cadence).
    """
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "exp_f32_comp", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "tools", "exp_f32_comp.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    vehicle = c172s.build_vehicle("wa")
    tp = C172.trim_parameters()
    _, _, _, ts, rnorm = c172s.trim(vehicle, tp)
    assert float(rnorm) < 1e-10
    ts_vals = [float(v) for v in ts]

    ref = tool.leg(ts_vals, x64=True, comp=False, t_end=600.0,
                   scenario="cruise")
    got = tool.leg(ts_vals, x64=False, comp="'auto'", t_end=600.0,
                   scenario="cruise")
    dr = np.linalg.norm(np.asarray(got["r"]) - np.asarray(ref["r"]))
    dv = np.linalg.norm(np.asarray(got["v"]) - np.asarray(ref["v"]))
    de = np.max(np.abs(np.asarray(got["e"]) - np.asarray(ref["e"])))
    assert dr < 50.0, f"600 s compensated-f32 position drift {dr:.1f} m"
    assert dv < 0.01, f"600 s velocity drift {dv:.2e} m/s"
    assert de < 0.01, f"600 s attitude drift {de:.2e} rad"


@pytest.mark.fast
def test_mechanization_agreement_bare_body_1s():
    """Fast-tier drift check: a bare 6-DOF body (NoVehicleSystems, no aero/
    engine/gear) flown 1 s from a spinning, translating initial condition —
    WA vs ECEF agreement isolates the kinematics/integration chain at a
    fraction of the full-aircraft cost."""
    from flightjax.physics.aircraftbase import Vehicle, NoVehicleSystems
    from flightjax.physics.kinematics import WA, ECEF, kin_init

    ic = kin_init(lat=0.7, lon=0.2, h=800.0, euler=[0.3, 0.05, -0.1],
                  omega_wb_b=[0.1, -0.2, 0.05], v_eb_n=[50.0, 5.0, -2.0])
    out = {}
    for name, kin in (("wa", WA()), ("ecef", ECEF())):
        veh = Vehicle(NoVehicleSystems(mass=100.0), kin)
        x = veh.init_x(kin_init=ic)
        u = veh.init_u()
        s = veh.init_s(x=x)
        sim = Simulation(veh, dt=0.02)
        state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                         x=x, u=u, s=s)
        final, _ = sim.run(state, t_end=1.0, save_y=False)
        _, y = veh.f_ode(final.x, final.u, final.s, 1.0)
        out[name] = y
    np.testing.assert_allclose(np.asarray(out["wa"].kinematics.r_eb_e),
                               np.asarray(out["ecef"].kinematics.r_eb_e),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["wa"].kinematics.v_eb_b),
                               np.asarray(out["ecef"].kinematics.v_eb_b),
                               atol=1e-9)


@pytest.mark.slow
def test_f32_envelope_600s_autopilot():
    """The f32 envelope for the CLOSED-LOOP autopilot mission (BASELINE
    row 3): 600 s C172Xv1 turning climb (EAS 45 + 1.5 m/s climb + course
    capture), f32+Kahan vs f64. Measured 2026-08-21
    (tools/exp_f32_comp.py, scenario 'autopilot'):

        comp=True : |dr| = 0.85 m, |dv| = 2.1e-5 m/s,
                    attitude 7.1e-6 rad, EAS 1e-5 m/s
        comp=False: |dr| = 63.2 m

    The regulator suppresses the open-loop drift modes — everything but
    absolute position is ~f32-roundoff-exact, and compensated absolute
    position stays sub-metre over the full mission. Bounds carry ~5x
    margin. Each leg trims itself: the autopilot regulates away sub-ulp
    trim scatter within seconds (see tools/exp_f32_comp.py)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "exp_f32_comp", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "tools", "exp_f32_comp.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    ref = tool.leg([], x64=True, comp=False, t_end=600.0,
                   scenario="autopilot")
    got = tool.leg([], x64=False, comp="'auto'", t_end=600.0,
                   scenario="autopilot")
    dr = np.linalg.norm(np.asarray(got["r"]) - np.asarray(ref["r"]))
    dv = np.linalg.norm(np.asarray(got["v"]) - np.asarray(ref["v"]))
    de = np.max(np.abs(np.asarray(got["e"]) - np.asarray(ref["e"])))
    dEAS = abs(got["EAS"] - ref["EAS"])
    assert dr < 5.0, f"600 s closed-loop f32 position drift {dr:.2f} m"
    assert dv < 1e-3, f"600 s closed-loop velocity drift {dv:.2e} m/s"
    assert de < 1e-4, f"600 s closed-loop attitude drift {de:.2e} rad"
    assert dEAS < 1e-3, f"600 s closed-loop EAS drift {dEAS:.2e} m/s"


@pytest.mark.slow
def test_f32_envelope_600s_autopilot_nav():
    """The f32 envelope for the SENSOR-FED closed loop: 600 s turning
    climb flown entirely on estimated states (SensorSuite -> InsGps ->
    ControlLaws). Sensor noise streams are defined in f32 and cast up
    (sensors._draws), so the f64/f32 legs fly identical realizations and
    the comparison is pure arithmetic drift. Measured 2026-08-21:
    comp=True |dr| = 0.37 m, |dv| = 1.4e-4 m/s, attitude 4.4e-5 rad,
    EAS 2e-5 m/s (comp=False: 1118 m). Re-measured after the round-5
    stacked/deferred filter rework: dr = 0.73 m, dv = 5.4e-4 m/s,
    de = 4.3e-5 rad — still at the sub-metre sensor-noise floor."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "exp_f32_comp", os.path.join(os.path.dirname(__file__), os.pardir,
                                     "tools", "exp_f32_comp.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    ref = tool.leg([], x64=True, comp=False, t_end=600.0,
                   scenario="autopilot_nav")
    got = tool.leg([], x64=False, comp="'auto'", t_end=600.0,
                   scenario="autopilot_nav")
    dr = np.linalg.norm(np.asarray(got["r"]) - np.asarray(ref["r"]))
    dv = np.linalg.norm(np.asarray(got["v"]) - np.asarray(ref["v"]))
    de = np.max(np.abs(np.asarray(got["e"]) - np.asarray(ref["e"])))
    assert dr < 5.0, f"600 s sensor-fed f32 position drift {dr:.2f} m"
    assert dv < 2e-3, f"600 s sensor-fed velocity drift {dv:.2e} m/s"
    assert de < 5e-4, f"600 s sensor-fed attitude drift {de:.2e} rad"
