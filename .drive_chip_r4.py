"""Round-4 chip drive (verify recipe): trivial probe, vmapped InsGps at
batch 512, then the closed-loop nav fleet (C172X on estimated states) at
batch 512 on the real TPU — f32, covariances must stay finite."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t0 = time.time()
print("devices:", jax.devices(), flush=True)
print("probe:", float(jax.jit(lambda x: (x * x).sum())(jnp.arange(8.0))),
      f"[{time.time()-t0:.0f}s]", flush=True)

# ---- 1. vmapped InsGps coordinated turn, batch 512
from flightjax.ops.attitude import euler_to_quat, rvec_to_quat
from flightjax.ops.quaternions import qmul, qnormalize, qrot_inv
from flightjax.physics.sensors import mag_field_ned
from flightjax.utils.estimation import InsGps, attitude_error_deg

dt, K, B = 0.02, 1000, 512
V, psi_dot, phi0, g = 45.0, np.deg2rad(3.0), np.deg2rad(15.0), 9.80665
t = jnp.arange(K) * dt
psi = psi_dot * t
g_n = jnp.asarray([0.0, 0.0, g])
B_n = mag_field_ned(declination=jnp.deg2rad(8.0))


def one(psi_k):
    q = euler_to_quat(jnp.stack([psi_k, 0.0 * psi_k, jnp.asarray(phi0)]))
    om = qrot_inv(q, jnp.asarray([0.0, 0.0, psi_dot]))
    v_n = V * jnp.stack([jnp.cos(psi_k), jnp.sin(psi_k), 0.0 * psi_k])
    a_n = V * psi_dot * jnp.stack([-jnp.sin(psi_k), jnp.cos(psi_k),
                                   0.0 * psi_k])
    return q, om, v_n, qrot_inv(q, a_n - g_n)


qs, oms, v_ns, f_bs = jax.vmap(one)(psi)
p_ns = (V / psi_dot) * jnp.stack(
    [jnp.sin(psi), 1.0 - jnp.cos(psi), jnp.zeros_like(psi)], axis=-1)
ekf = InsGps(dt=dt, B_n=B_n)


def lane(seed):
    key = jax.random.PRNGKey(seed)
    kg, ka, km, kp, kv = jax.random.split(key, 5)
    gyro = oms + 8.7e-4 * jax.random.normal(kg, (K, 3))
    acc = f_bs + 0.02 * jax.random.normal(ka, (K, 3))
    mag = jax.vmap(lambda q: qrot_inv(q, B_n))(qs) \
        + 150e-9 * jax.random.normal(km, (K, 3))
    gps_news = (jnp.arange(K) % 10) == 0
    gps_ps = p_ns + 1.6 * jax.random.normal(kp, (K, 3))
    gps_vs = v_ns + 0.06 * jax.random.normal(kv, (K, 3))
    st, (qh, vh, ph) = ekf.run(ekf.init(q_nb=qs[0], v_n=v_ns[0]), gyro,
                               acc, mag, gps_ps, gps_vs, gps_news)
    return attitude_error_deg(qh[-1], qs[-1]), st.P


err, P = jax.block_until_ready(
    jax.jit(jax.vmap(lane))(jnp.arange(B, dtype=jnp.int32)))
print(f"[{time.time()-t0:.0f}s] InsGps b512 turn 20s: att err mean "
      f"{float(err.mean()):.3f} max {float(err.max()):.3f} deg", flush=True)
assert bool(jnp.isfinite(P).all()) and float(err.max()) < 5.0
eig = jnp.linalg.eigvalsh(P)
print("  P min eig:", float(eig.min()), flush=True)
assert float(eig.min()) > 0.0

# ---- 2. closed-loop nav fleet on the chip, batch 512
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tools.bench_report import _autopilot_fleet_state
from flightjax.parallel import fleet

sim, st = _autopilot_fleet_state(sensor_fed=True, batch=512)
st = jax.block_until_ready(fleet.fleet_rollout(sim, st, n_steps=500))
print(f"[{time.time()-t0:.0f}s] nav closed-loop fleet b512 x 500 steps on "
      f"chip done", flush=True)
y = jax.vmap(lambda s: sim.output(s, ()))(st)
EAS = np.asarray(y.vehicle.airflow.EAS)
Pn = np.asarray(st.s["avionics"]["nav"].P)
print("  EAS mean/min/max:", EAS.mean(), EAS.min(), EAS.max(), flush=True)
assert np.isfinite(EAS).all() and abs(EAS.mean() - 45.0) < 2.0
assert np.isfinite(Pn).all()
alarms = np.asarray(st.s["avionics"]["mon_gps"]["alarm"])
print("  false gps alarms:", int(alarms.sum()), "/", B, flush=True)
assert alarms.sum() == 0
print(f"[{time.time()-t0:.0f}s] ALL CHIP CHECKS OK", flush=True)
