"""Multi-host (DCN) test for the FLAGSHIP workload (VERDICT r4 #6): the
closed-loop sensor-fed C172X nav fleet — SensorSuite -> InsGps ->
ControlLaws with in-loop FDI — sharded across TWO OS processes via
`jax.distributed`, with per-lane physics identical to the single-process
sharded run and the GPS-freeze alarms landing on exactly the faulted
lanes across the process boundary.

Not in the fast tier: each worker trims the C172X and compiles the
sharded nav step (cached across runs via .jax_cache, but still minutes
cold on this 1-CPU box)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from flightjax.core.sim import Simulation
from flightjax.models.c172 import c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL
from flightjax.parallel import fleet
from flightjax.physics import navigation as NAV
from flightjax.physics.aircraftbase import SimpleWorld

DT = 0.02
B_GLOBAL = 8
K0 = 100          # GPS freeze 2 s in, global lanes 4..7
N_STEPS = 300     # 6 s

def build_state():
    aircraft = c172x.build_xv1_nav("wa", periodic_dt=DT)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, _, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                      periodic_dt=DT)
    assert float(rnorm) < 1e-8
    av = dict(state.u["avionics"])
    inner = {"lon": dict(av["inner"]["lon"]), "lat": dict(av["inner"]["lat"])}
    inner["lon"]["mode_req"] = jnp.asarray(CTL.LON_EAS_CLM, jnp.int32)
    inner["lon"]["EAS_ref"] = jnp.asarray(45.0)
    inner["lon"]["clm_ref"] = jnp.asarray(1.5)
    inner["lat"]["mode_req"] = jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32)
    inner["lat"]["chi_ref"] = jnp.asarray(np.pi / 2)
    av["inner"] = inner
    return sim, state._replace(u=dict(state.u, avionics=av))

def lane_inputs(st, lanes):
    '''Per-GLOBAL-lane sensor seeds + GPS-freeze faults on lanes >= 4.'''
    lanes = jnp.asarray(lanes, jnp.int32)
    av_u = dict(st.u["avionics"])
    av_u["sens"] = dict(av_u["sens"], seed=lanes)
    faulted = lanes >= 4
    av_u["fault"] = dict(NAV.no_fault(),
                         channel=jnp.full(lanes.shape, NAV.FAULT_GPS,
                                          jnp.int32),
                         mode=jnp.full(lanes.shape, NAV.MODE_FREEZE,
                                       jnp.int32),
                         k0=jnp.where(faulted, K0, NAV._NEVER).astype(
                             jnp.int32),
                         k1=jnp.full(lanes.shape, NAV._NEVER, jnp.int32),
                         delta=jnp.zeros(lanes.shape))
    return st._replace(u=dict(st.u, avionics=av_u))

def result_dict(out, lane_sel=None):
    alarms = out.s["avionics"]["mon_gps"]["alarm"]
    h = out.x["vehicle"]["kinematics"]["h_e"]
    q = out.x["vehicle"]["kinematics"]["q_wb"]
    if lane_sel is not None:
        alarms, h, q = alarms[lane_sel], h[lane_sel], q[lane_sel]
    return {"alarms": [bool(a) for a in np.asarray(alarms)],
            "h_e": [float(v) for v in np.asarray(h)],
            "q0": [float(v) for v in np.asarray(q)[:, 0]]}
"""

WORKER = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
from flightjax.parallel import distributed
distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
""" + SETUP + r"""
assert len(jax.devices()) == 8 and jax.process_count() == 2

sim, st = build_state()
B_local = B_GLOBAL // 2
local = fleet.broadcast_state(st, B_local)
local = lane_inputs(local, np.arange(B_GLOBAL)[pid * B_local:
                                               (pid + 1) * B_local])
mesh = distributed.global_fleet_mesh()
gstate = distributed.make_global_fleet(local, mesh)
roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=N_STEPS)
out, t_mean = roll(gstate)
mine = distributed.process_local_lanes(out)
res = result_dict(mine)
res["t_mean"] = float(t_mean)
print("RESULT", json.dumps(res), flush=True)
"""

TRUTH = r"""
import os, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
""" + SETUP + r"""
sim, st = build_state()
state = lane_inputs(fleet.broadcast_state(st, B_GLOBAL),
                    np.arange(B_GLOBAL))
mesh, gstate = fleet.shard_fleet(state)
roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=N_STEPS)
out, t_mean = roll(gstate)
res = result_dict(out)
res["t_mean"] = float(t_mean)
print("RESULT", json.dumps(res), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_c172_nav_fleet_two_process_dcn():
    # single-process 8-device truth (the ICI path)
    p = subprocess.run([sys.executable, "-c", TRUTH], capture_output=True,
                       text=True, timeout=3000, cwd=HERE)
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    assert p.returncode == 0 and lines, (p.stdout[-2000:], p.stderr[-3000:])
    truth = json.loads(lines[0][7:])
    # sanity on the truth itself: exactly the faulted lanes alarmed
    assert truth["alarms"] == [False] * 4 + [True] * 4

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=HERE) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert p.returncode == 0 and lines, (out[-2000:], err[-3000:])
        outs.append(json.loads(lines[0][7:]))

    got_alarms, got_h, got_q = [], [], []
    for res in outs:
        np.testing.assert_allclose(res["t_mean"], truth["t_mean"], atol=1e-12)
        got_alarms += res["alarms"]
        got_h += res["h_e"]
        got_q += res["q0"]
    # FDI alarms land on the right lanes ACROSS the process boundary
    assert got_alarms == truth["alarms"]
    # per-lane physics identical to the single-process sharded run
    np.testing.assert_allclose(got_h, truth["h_e"], rtol=1e-12)
    np.testing.assert_allclose(got_q, truth["q0"], rtol=1e-12)
