"""On-chip 10 s absolute-position drift vs the CPU f64 golden, under
interp matmul precision HIGH (3-pass bf16) vs HIGHEST (6-pass).

Validates that dropping the dense-interp contraction to Precision.HIGH
does not degrade the compensated-f32 drift budget on real hardware.
Run: python tools/exp_precision_drift.py [t_end=10]
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import jax
if {cpu}:
    jax.config.update('jax_platforms', 'cpu')
if {x64}:
    jax.config.update('jax_enable_x64', True)
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import json
import jax.numpy as jnp
import numpy as np
from flightjax.ops import interp
interp._PRECISION = getattr(jax.lax.Precision, {prec!r})
from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172

tp = C172.trim_parameters()
ts = C172.TrimState(*[jnp.asarray(v) for v in {ts_vals!r}])
world = c172s.flagship_world('wa')
sim = Simulation(world, dt=0.02, compensate='auto')
x, u, s = c172s.trim_assign(world.aircraft.vehicle, tp, ts)
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
    v=np.asarray(y.kinematics.v_eb_b, dtype=np.float64).tolist())))
"""


def leg(ts_vals, cpu, x64, prec, t_end):
    code = BODY.format(cpu=cpu, x64=x64, prec=prec, ts_vals=ts_vals,
                       t_end=t_end, cache=os.path.join(HERE, ".jax_cache"))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=2400, cwd=HERE)
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stderr[-3000:]
    return json.loads(lines[0][7:])


def main():
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
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
    ref = leg(ts_vals, cpu=True, x64=True, prec="HIGHEST", t_end=t_end)
    for name, cpu, prec in (("cpu-f32", True, "HIGHEST"),
                            ("tpu-f32 HIGHEST", False, "HIGHEST"),
                            ("tpu-f32 HIGH", False, "HIGH")):
        got = leg(ts_vals, cpu=cpu, x64=False, prec=prec, t_end=t_end)
        dr = np.linalg.norm(np.asarray(got["r"]) - np.asarray(ref["r"]))
        dv = np.linalg.norm(np.asarray(got["v"]) - np.asarray(ref["v"]))
        print(f"t_end={t_end}s {name:16s}: |dr|={dr:.4f} m  |dv|={dv:.6f} m/s",
              flush=True)


if __name__ == "__main__":
    main()
