"""Measure f32 drift (position / attitude / EAS) with and without
compensated (Kahan) position accumulation (core.sim.comp_add), against the
f64 WA trajectory.

Run:  python tools/exp_f32_comp.py [t_end] [scenario] [device]
  t_end    horizon seconds (default 10; the flagship workloads are 600)
  scenario 'step' (trim + 0.1 elevator step, the round-2 case) or
           'cruise' (steady trimmed cruise — isolates integration error
           from dynamic amplification; the envelope-bound case)
  device   'cpu' (default) or 'tpu' for the f32 legs; the f64 reference
           always runs on CPU (TPU f64 trig is only f32-accurate)

The f64 reference and the two f32 legs run in SUBPROCESSES so each gets a
clean x64/platform configuration (enabling x64 in-process silently promotes
constants). Reference semantics anchor for why f32 needs the renorm/comp
treatment: `kinematics.jl:181-229`.

Round-3 measured envelope (this tool; see docs/notes/performance.md and
BENCHMARKS.md "f32 accuracy envelope"):
  600 s cruise,  comp=True,  CPU f32: |dr| ~ 1.5 m
  600 s cruise,  comp=False, CPU f32: |dr| ~ 83 m
(values re-measured per round; the numbers above are from 2026-08-19)
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import jax
if {tpu}:
    pass  # axon sitecustomize default platform IS the TPU
else:
    jax.config.update('jax_platforms', 'cpu')
if {x64}:
    jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import json
import jax.numpy as jnp
import numpy as np
from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172

tp = C172.trim_parameters()
if {scenario!r} in ('autopilot', 'autopilot_nav'):
    # closed-loop C172X turning climb (truth-fed v1, or flying on
    # ESTIMATED states via physics/navigation.NavAvionics): each leg
    # trims itself — the autopilot regulates away the sub-ulp trim
    # differences within seconds, so the 600 s comparison measures the
    # closed-loop f32 envelope, not trim scatter
    from flightjax.models.c172 import c172x
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.physics.aircraftbase import SimpleWorld
    if {scenario!r} == 'autopilot_nav':
        aircraft = c172x.build_xv1_nav('wa', periodic_dt=0.02)
    else:
        aircraft = c172x.build_xv1('wa')
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=0.02, periodic_dt=0.02, compensate={comp})
    state, _, _ = c172x.trim_world(aircraft, tp, periodic_dt=0.02)
    av = dict(state.u['avionics'])
    tgt = dict(av['inner']) if 'inner' in av else av
    lon = dict(tgt['lon'], mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
               EAS_ref=jnp.asarray(45.0), clm_ref=jnp.asarray(1.5))
    lat = dict(tgt['lat'], mode_req=jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32),
               chi_ref=jnp.asarray(jnp.pi / 2))
    if 'inner' in av:
        av['inner'] = dict(tgt, lon=lon, lat=lat)
    else:
        av = dict(av, lon=lon, lat=lat)
    state = state._replace(u=dict(state.u, avionics=av))
    state = sim.with_compensation(state)
else:
    ts = C172.TrimState(*[jnp.asarray(v) for v in {ts_vals!r}])
    world = c172s.flagship_world('wa')
    sim = Simulation(world, dt=0.02, compensate={comp})
    x, u, s = c172s.trim_assign(world.aircraft.vehicle, tp, ts)
    if {scenario!r} == 'step':
        act = dict(u['systems']['act'])
        act['elevator'] = act['elevator'] + 0.1
        u = dict(u, systems=dict(u['systems'], act=act))
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={{'vehicle': x}}, u={{'vehicle': u}},
                     s={{'vehicle': s, 'terminated': jnp.asarray(False)}})
    state = sim.with_compensation(state)
final, _ = sim.run(state, t_end={t_end}, save_y=False)
_, y = world.aircraft.vehicle.f_ode(final.x['vehicle'], final.u['vehicle'],
                                    final.s['vehicle'], {t_end})
print('RESULT', json.dumps(dict(
    r=np.asarray(y.kinematics.r_eb_e, dtype=np.float64).tolist(),
    v=np.asarray(y.kinematics.v_eb_b, dtype=np.float64).tolist(),
    e=np.asarray(y.kinematics.e_nb, dtype=np.float64).tolist(),
    EAS=float(y.airflow.EAS))))
"""


def leg(ts_vals, x64, comp, t_end, scenario="step", tpu=False):
    code = BODY.format(x64=x64, comp=comp, ts_vals=ts_vals, t_end=t_end,
                       scenario=scenario, tpu=tpu,
                       cache=os.path.join(HERE, ".jax_cache"))
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, cwd=HERE, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stderr[-3000:]
    return json.loads(lines[0][7:])


def main():
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    scenario = sys.argv[2] if len(sys.argv) > 2 else "step"
    device = sys.argv[3] if len(sys.argv) > 3 else "cpu"
    # trim once in f64
    code = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir',
                  {os.path.join(HERE, '.jax_cache')!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import json
from flightjax.models.c172 import c172s, common as C172
v = c172s.build_vehicle('wa')
_, _, _, ts, rn = c172s.trim(v, C172.trim_parameters())
print('RESULT', json.dumps([float(x) for x in ts]))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=2400, cwd=HERE)
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stderr[-3000:]
    ts_vals = json.loads(lines[0][7:])

    import numpy as np
    ref = leg(ts_vals, x64=True, comp=False, t_end=t_end, scenario=scenario)
    for comp in (False, True):
        got = leg(ts_vals, x64=False, comp="'auto'" if comp else False,
                  t_end=t_end, scenario=scenario, tpu=(device == "tpu"))
        dr = np.linalg.norm(np.asarray(got["r"]) - np.asarray(ref["r"]))
        dv = np.linalg.norm(np.asarray(got["v"]) - np.asarray(ref["v"]))
        de = np.max(np.abs(np.asarray(got["e"]) - np.asarray(ref["e"])))
        dEAS = abs(got["EAS"] - ref["EAS"])
        print(f"t_end={t_end}s scenario={scenario} device={device} "
              f"comp={comp}: |dr|={dr:.4f} m  |dv|={dv:.6f} m/s  "
              f"|de|={de:.3e} rad  |dEAS|={dEAS:.5f} m/s", flush=True)


if __name__ == "__main__":
    main()
