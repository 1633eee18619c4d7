"""Measure & report every BASELINE.json config on the current TPU chip and
write BENCHMARKS.md at the repo root.

Configs (BASELINE.json "configs"):
  1. Robot2D self-balancing robot, t_end=100 s, dt=0.01
  2. Cessna 172S v0 (NED): trim + 10 s elevator-step response, headless
  3. Cessna 172X fly-by-wire: 600 s turning climb, gain-scheduled autopilot
     + wind (the reference's `turning_climb`, `c172_demos.jl:214-259`)
  4. Trim + linearize: Newton trim solve + NED state-space extraction
  5. Monte Carlo fleet: 4096 vmapped C172s, randomized wind/mass/CG/fuel,
     full 600 s rollout on one chip

Run: python tools/bench_report.py            (~15 min incl. compiles)
Compile time is reported separately from the steady-state wall-clock
(second call on identical shapes; XLA executable reuse), and the trim
solve separately from the rollout.

Device routing: batch-1 configs run on the host CPU backend
(`jax.default_device`), where a single vehicle is ~3x faster than the
TPU — a lone aircraft's ~100-float state can't feed the MXU; the TPU
earns its keep on the fleet config (batch 4096), which runs on the chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass


def timed(fn, *args, reps=3, **kw):
    """(cold_seconds, warm_seconds, result): first call incl. compile, then
    the median of `reps` warm calls."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kw))
    cold = time.perf_counter() - t0
    warm = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        warm.append(time.perf_counter() - t0)
    warm.sort()
    return cold, warm[len(warm) // 2], out


def _cpu():
    return jax.devices("cpu")[0]


def bench_robot2d():
    from flightjax.core.sim import Simulation
    from flightjax.models.robot2d import Robot

    with jax.default_device(_cpu()):
        sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
        state0 = sim.init()

        def run(st):
            final, _ = sim.run(st, t_end=100.0, t0=0.0, save_every=100)
            return final

        cold, warm, final = timed(run, state0)
    assert bool(jnp.isfinite(final.x["vehicle"]["theta"]).all())
    return {"config": "robot2d_100s", "device": "cpu-host", "steps": 10000,
            "compile_s": round(cold - warm, 2), "wall_s": round(warm, 4),
            "sim_time_per_wall": round(100.0 / warm, 1)}


def bench_c172s_elevator():
    from flightjax.demos.c172_demos import (elevator_doublet,
                                            elevator_doublet_setup)

    with jax.default_device(_cpu()):
        t0 = time.perf_counter()
        rig = elevator_doublet_setup(dt=0.02)
        trim_s = time.perf_counter() - t0

        def run():
            final, log = elevator_doublet(t_end=10.0, dt=0.02, rig=rig)
            return final

        cold, warm, final = timed(run)
    return {"config": "c172s_trim_plus_10s_elevator_step",
            "device": "cpu-host", "steps": 500,
            "trim_s": round(trim_s, 2),
            "compile_s": round(cold - warm, 2), "wall_s": round(warm, 3),
            "sim_time_per_wall": round(10.0 / warm, 1)}


def bench_turning_climb():
    from flightjax.demos.c172_demos import turning_climb, turning_climb_setup

    with jax.default_device(_cpu()):
        t0 = time.perf_counter()
        rig = turning_climb_setup(dt=0.01)
        trim_s = time.perf_counter() - t0

        def run():
            final, _ = turning_climb(t_end=600.0, dt=0.01, rig=rig)
            return final

        cold, warm, final = timed(run, reps=1)
    return {"config": "c172x_600s_turning_climb_autopilot",
            "device": "cpu-host", "steps": 60000,
            "trim_s": round(trim_s, 2),
            "compile_s": round(cold - warm, 2), "wall_s": round(warm, 2),
            "sim_time_per_wall": round(600.0 / warm, 1)}


def bench_trim_linearize():
    from flightjax.models.c172 import c172s

    with jax.default_device(_cpu()):
        vehicle = c172s.build_vehicle("ned")

        def solve():
            x, u, s, ts, rnorm = c172s.trim(vehicle)
            return rnorm

        cold, warm, rnorm = timed(solve)
        t0 = time.perf_counter()
        lss, _, _ = c172s.linearize_ned()
        lin_s = time.perf_counter() - t0
    return {"config": "trim_plus_linearize_ned", "device": "cpu-host",
            "trim_compile_s": round(cold - warm, 2),
            "trim_wall_s": round(warm, 3),
            "trim_residual": float(rnorm),
            "linearize_wall_s": round(lin_s, 2),
            "n_states": int(lss.A.shape[0])}


def bench_monte_carlo_fleet(batch=4096, t_end=600.0):
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel import fleet

    sim, state0, ctx = flagship_sim()
    # the randomized fleet has lanes that descend/crash into terrain, so
    # the airborne gear gate never gets to skip — but its conds still pay
    # their fusion-boundary cost (12.1M vs 14.9M steps/s measured). Turn
    # it off for this ground-heavy workload (docs/notes/performance.md).
    sim = sim.replace(gear_gate_margin=None)
    st = fleet.broadcast_state(state0, batch)
    st = fleet.monte_carlo_c172(st, jax.random.PRNGKey(0))
    n_steps = int(round(t_end / sim.dt))

    def run(s):
        return fleet.fleet_rollout(sim, s, n_steps, ctx)

    cold, warm, final = timed(run, st, reps=2)
    steps = batch * n_steps
    return {"config": f"monte_carlo_fleet_{batch}x{int(t_end)}s",
            "device": jax.devices()[0].device_kind,
            "steps": steps, "compile_s": round(cold - warm, 2),
            "wall_s": round(warm, 2),
            "vehicle_steps_per_s": int(steps / warm),
            "fleet_sim_time_per_wall": round(t_end / warm, 1)}


def bench_cruise_fleet_large(batch=16384, steps_per_call=4000):
    """Official large-batch secondary benchmark: the headline bench.py
    measurement (airborne cruise fleet, gear gate on, unroll=4, 4000-step
    dispatches) at batch 16384, where the fixed per-kernel overhead that
    bounds the batch-4096 number (docs/notes/performance.md "roofline")
    amortizes further — the chip's true per-chip capability."""
    from flightjax.models.c172 import flagship_sim

    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (batch,) + jnp.shape(leaf)),
        state0)

    def roll_plain(st):
        def body(st, _):
            return sim.fleet_step(st, ctx), None
        st, _ = jax.lax.scan(body, st, None, length=steps_per_call,
                             unroll=4)
        return st

    roll = jax.jit(roll_plain, donate_argnums=(0,))
    t0 = time.perf_counter()
    carry = jax.block_until_ready(roll(state))
    compile_s = time.perf_counter() - t0
    carry = jax.block_until_ready(roll(carry))
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry = roll(carry)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    sps = batch * steps_per_call * n_calls / dt
    return {"config": f"cruise_fleet_batch{batch}",
            "device": jax.devices()[0].device_kind,
            "steps_per_dispatch": steps_per_call,
            "compile_s": round(compile_s, 2),
            "us_per_fleet_step": round(dt / (n_calls * steps_per_call) * 1e6,
                                       1),
            "vehicle_steps_per_s": int(sps)}


def _autopilot_fleet_state(sensor_fed, batch, dt=0.02):
    """Trimmed C172Xv1 turning-climb fleet (EAS 45 + 1.5 m/s climb +
    course capture engaged), truth-fed or flying on estimated states
    (physics/navigation.NavAvionics)."""
    import jax.numpy as jnp

    from flightjax.core.sim import Simulation
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.parallel import fleet
    from flightjax.physics.aircraftbase import SimpleWorld

    if sensor_fed:
        aircraft = c172x.build_xv1_nav("wa", periodic_dt=dt)
    else:
        aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=dt, periodic_dt=dt, geoid_every=128,
                     gear_gate_margin=10.0)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                   periodic_dt=dt)
    av = dict(state.u["avionics"])
    tgt = dict(av["inner"]) if "inner" in av else av
    lon = dict(tgt["lon"], mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
               EAS_ref=jnp.asarray(45.0), clm_ref=jnp.asarray(1.5))
    lat = dict(tgt["lat"], mode_req=jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32),
               chi_ref=jnp.asarray(jnp.pi / 2))
    if "inner" in av:
        av["inner"] = dict(tgt, lon=lon, lat=lat)
    else:
        av = dict(av, lon=lon, lat=lat)
    state = state._replace(u=dict(state.u, avionics=av))
    st = fleet.broadcast_state(state, batch)
    if sensor_fed:
        av_u = dict(st.u["avionics"])
        av_u["sens"] = dict(av_u["sens"],
                            seed=jnp.arange(batch, dtype=jnp.int32))
        st = st._replace(u=dict(st.u, avionics=av_u))
    return sim, st


def _bench_autopilot(sensor_fed, batch=4096, t_end=600.0):
    """BASELINE row 3 measured AT FLEET SCALE ON THE CHIP: the 600 s
    turning climb with the discrete gain-scheduled cascade firing every
    step — truth-fed, and (round 4) flying entirely on estimated states
    through the in-loop SensorSuite -> InsGps stage."""
    import jax.numpy as jnp

    from flightjax.parallel import fleet

    sim, st = _autopilot_fleet_state(sensor_fed, batch)
    n_steps = int(round(t_end / sim.dt))
    # chunked dispatches: a 30000-step scan as ONE device execution can
    # trip the accelerator watchdog through the tunnel (observed on the
    # sensor-fed config); 5000-step chunks are comfortably under it and
    # cost nothing (same executable, scan trip count is runtime)
    chunk = 5000
    n_chunks, rem = divmod(n_steps, chunk)
    assert rem == 0

    def run(s):
        for _ in range(n_chunks):
            s = fleet.fleet_rollout(sim, s, chunk, unroll=4)
        return s

    cold, warm, final = timed(run, st, reps=1)
    # certify the cascade actually flew the mission: every lane airborne,
    # on-speed and climbing at the references
    y = jax.vmap(lambda s: sim.output(s, ()))(final)
    EAS = jnp.asarray(y.vehicle.airflow.EAS)
    clm = -jnp.asarray(y.vehicle.kinematics.v_eb_n)[:, 2]
    assert bool(jnp.isfinite(EAS).all())
    assert abs(float(EAS.mean()) - 45.0) < 1.0, float(EAS.mean())
    assert abs(float(clm.mean()) - 1.5) < 0.3, float(clm.mean())
    steps = batch * n_steps
    name = "sensor_fed_nav" if sensor_fed else "truth_fed"
    return {"config": f"autopilot_fleet_{name}_{batch}x{int(t_end)}s",
            "device": jax.devices()[0].device_kind,
            "steps": steps, "compile_s": round(cold - warm, 2),
            "wall_s": round(warm, 2),
            "vehicle_steps_per_s": int(steps / warm),
            "fleet_sim_time_per_wall": round(t_end / warm, 1),
            "final_EAS_mean": round(float(EAS.mean()), 2),
            "final_climb_mean": round(float(clm.mean()), 2)}


def bench_autopilot_fleet_truth():
    return _bench_autopilot(sensor_fed=False)


def bench_autopilot_fleet_sensor():
    return _bench_autopilot(sensor_fed=True)


def bench_autopilot_fleet_sensor_large():
    """The sensor-fed mission at batch 16384 — the launch-bound step's
    per-kernel overhead amortizes with batch (same rationale as
    `cruise_fleet_batch16384`), so this is the chip's true per-chip
    sensor-fed capability."""
    return _bench_autopilot(sensor_fed=True, batch=16384)


F32_ENVELOPE = """
## f32 accuracy envelope carried by the fleet numbers

The fleet/MC rows above run the f32 fast path with Kahan-compensated
position accumulation (`Simulation(compensate="auto")`, the `flagship_sim`
configuration). Measured drift vs the f64 trajectory
(`tools/exp_f32_comp.py`; bounds enforced by `tests/test_drift.py`):

| horizon | scenario | position | velocity | attitude | EAS |
|---|---|---|---|---|---|
| 10 s | trim + elevator step | 0.73 m | 5e-5 m/s | 7e-7 rad | 5e-5 m/s |
| 600 s | trimmed cruise | 21.8 m | 1.1e-3 m/s | 1.9e-3 rad | 1.1e-3 m/s |
| 600 s | trim + elevator step (phugoid) | 0.91 m | 4e-4 m/s | 7.5e-4 rad | 3e-4 m/s |
| 600 s | trimmed cruise, comp OFF | 753 m | 1.0e-3 m/s | 1.8e-3 rad | 9e-4 m/s |
| 600 s | CLOSED-LOOP turning climb (truth-fed autopilot) | 0.85 m | 2.1e-5 m/s | 7.1e-6 rad | 1e-5 m/s |
| 600 s | CLOSED-LOOP turning climb (sensor-fed, InsGps) | 0.73 m | 5.4e-4 m/s | 4.3e-5 rad | 2e-5 m/s |
| 600 s | closed-loop turning climb, comp OFF | 63.2 m | 1.7e-3 m/s | 5.8e-6 rad | 3e-5 m/s |

Compensation recovers the sub-f32-ulp per-step position increments
(`docs/notes/performance.md` "Accuracy/throughput trade"); everything
except absolute position is f32-roundoff-limited either way. The open-
loop 600 s fleet numbers carry a ~22 m absolute-position envelope; the
CLOSED-LOOP autopilot rows (measured 2026-08-21, `tools/exp_f32_comp.py`
scenarios `autopilot`/`autopilot_nav`, test-enforced by
`tests/test_drift.py::test_f32_envelope_600s_autopilot*`) are sub-metre:
the regulator suppresses the open-loop drift modes, so BASELINE row 3's
mission carries f32 accuracy at the sensor-noise floor, flown either on
truth or entirely on estimated states.

One further f32-truth characterization (round 4): DURING aggressive
maneuvers the geodetic position derived from the f32 position quaternion
carries transient rounding wander (~15 m steady / ~45 m mid-turn,
relaxing afterwards; end-of-mission values above are unaffected). The
nav stack derates GPS position aiding accordingly on the f32 path
(`estimation.InsGps.R_pos_eff`).
"""


ROW_CACHE = os.path.join(ROOT, ".bench_rows.json")


def main():
    dev = jax.devices()[0]
    # Rows are cached per config as they complete so an interrupted report
    # (each full run is ~35 min) resumes instead of remeasuring; pass
    # --fresh to force a clean remeasure of everything.
    cache = {}
    if "--fresh" not in sys.argv and os.path.exists(ROW_CACHE):
        with open(ROW_CACHE) as f:
            cache = json.load(f)
    rows = []
    for fn in (bench_robot2d, bench_c172s_elevator, bench_turning_climb,
               bench_trim_linearize, bench_monte_carlo_fleet,
               bench_cruise_fleet_large, bench_autopilot_fleet_truth,
               bench_autopilot_fleet_sensor,
               bench_autopilot_fleet_sensor_large):
        if fn.__name__ in cache:
            rows.append(cache[fn.__name__])
            print(json.dumps(cache[fn.__name__]), "(cached)")
            continue
        row = fn()
        rows.append(row)
        cache[fn.__name__] = row
        with open(ROW_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
        print(json.dumps(row))

    lines = [
        "# BENCHMARKS — every BASELINE.json config, measured",
        "",
        f"Accelerator: {dev.device_kind} ({dev.platform}); default dtype "
        f"float32; produced by `tools/bench_report.py`.",
        "",
        "Per-config `device`: batch-1 configs run on the host CPU backend "
        "(a single vehicle's ~100-float state can't feed the MXU and is "
        "~3x faster on host); the fleet config runs on the TPU chip, "
        "which is the workload the framework is designed around.",
        "",
        "Wall-clock = median warm call (XLA executable reused); compile_s "
        "= first-call overhead; trim_s = trim solve (reported separately "
        "from the rollout). `sim_time_per_wall` = simulated seconds per "
        "wall second (real-time factor).",
        "",
        "```json",
    ]
    lines += [json.dumps(r) for r in rows]
    lines += ["```", ""]
    lines += [
        "Headline (driver-run `bench.py`): full C172 world steps/sec at "
        "batch 4096 — see README Performance. The `cruise_fleet_batch16384`"
        " row is the official large-batch secondary benchmark: the same "
        "airborne-cruise measurement at the batch where the fixed "
        "per-kernel overhead amortizes (docs/notes/performance.md "
        "\"roofline\") — the chip's true per-chip capability.",
        "",
        "The `autopilot_fleet_*` rows put BASELINE row 3's mission ON THE "
        "CHIP AT FLEET SCALE: C172Xv1 fleets fly the full 600 s turning "
        "climb with the discrete gain-scheduled cascade firing every step "
        "(final EAS/climb asserted against the references in-run). "
        "`truth_fed` = the reference's architecture (laws read true "
        "kinematics); `sensor_fed_nav` = laws flying entirely on estimated "
        "states (SensorSuite -> 15-state InsGps EKF with five monitored "
        "FDI channels -> ControlLaws, physics/navigation.py). Round 5 "
        "restructured the filter's aiding pass for the launch-bound fleet "
        "step — ONE stacked masked Joseph update per aiding epoch (block-"
        "elimination innovation solve) and deferred covariance "
        "propagation (mean mechanized every firing, P compounded once per "
        "aiding interval) — lifting the batch-4096 row ~23% over round 4 "
        "while growing the monitored-channel count from two to five "
        "(docs/notes/performance.md round 5). The batch-16384 sensor-fed "
        "row is the launch-overhead-amortized per-chip capability, the "
        "same rationale as `cruise_fleet_batch16384`.",
        F32_ENVELOPE,
    ]
    with open(os.path.join(ROOT, "BENCHMARKS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCHMARKS.md")


if __name__ == "__main__":
    main()
