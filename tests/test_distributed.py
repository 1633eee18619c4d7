"""Multi-host (DCN) smoke test: two OS processes, each with 4 virtual CPU
devices, form one 8-device global mesh via `jax.distributed` and run the
sharded fleet rollout (`fleet.sharded_rollout_fn`) across the process
boundary — proving the shard_map DP path composes over DCN exactly as over
ICI (SURVEY.md §2.5). The single-process 8-device result is the truth; both
workers must reproduce its fleet-mean checksums."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
import jax.numpy as jnp
import numpy as np
from flightjax.core.sim import Simulation
from flightjax.models.robot2d import Robot
from flightjax.parallel import fleet

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2

sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
st = sim.init(u_m=0.0)
# global fleet of 16 lanes: this process contributes lanes [pid*8, pid*8+8)
B_local = 8
local = fleet.broadcast_state(st, B_local)
v_ref = np.linspace(0.0, 0.5, 16)[pid * 8:(pid + 1) * 8]
u = dict(local.u)
ctl = dict(u["ctl"]); ctl["v_ref"] = jnp.asarray(v_ref)
u["ctl"] = ctl
local = local._replace(u=u)

mesh = distributed.global_fleet_mesh()
gstate = distributed.make_global_fleet(local, mesh)
roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=100)
out, t_mean = roll(gstate)
v_mean = jax.jit(lambda s: jnp.mean(s.x["vehicle"]["v"]))(out)
mine = distributed.process_local_lanes(out)
print("RESULT", json.dumps({
    "t_mean": float(t_mean), "v_mean": float(v_mean),
    "local_lanes": int(mine.t.shape[0]),
    "local_v": [float(v) for v in mine.x["vehicle"]["v"]],
}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def single_process_truth():
    """Same fleet on one process with 8 virtual devices (the ICI path,
    already covered by test_fleet.py) — the checksum source."""
    code = r"""
import os, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from flightjax.core.sim import Simulation
from flightjax.models.robot2d import Robot
from flightjax.parallel import fleet

sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
st = sim.init(u_m=0.0)
state = fleet.broadcast_state(st, 16)
u = dict(state.u); ctl = dict(u["ctl"])
ctl["v_ref"] = jnp.asarray(np.linspace(0.0, 0.5, 16))
u["ctl"] = ctl
state = state._replace(u=u)
mesh, gstate = fleet.shard_fleet(state)
roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=100)
out, t_mean = roll(gstate)
print("RESULT", json.dumps({
    "t_mean": float(t_mean),
    "v_mean": float(jnp.mean(out.x["vehicle"]["v"])),
    "v": [float(v) for v in out.x["vehicle"]["v"]],
}), flush=True)
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, cwd=HERE)
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, p.stderr[-3000:]
    return json.loads(lines[0][7:])


def test_two_process_dcn_rollout(single_process_truth):
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
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert p.returncode == 0 and lines, (out[-2000:], err[-3000:])
        outs.append(json.loads(lines[0][7:]))

    truth = single_process_truth
    got_v = []
    for pid, res in enumerate(outs):
        # the pmean'd metrics are GLOBAL: every process sees the fleet mean
        np.testing.assert_allclose(res["t_mean"], truth["t_mean"], rtol=0,
                                   atol=1e-12)
        np.testing.assert_allclose(res["v_mean"], truth["v_mean"], rtol=1e-12)
        assert res["local_lanes"] == 8
        got_v += res["local_v"]
    # per-lane physics identical to the single-process sharded run
    np.testing.assert_allclose(got_v, truth["v"], rtol=1e-12)


def test_process_local_lanes_reordered_mesh():
    """Shard assembly must sort by global lane index, not device
    enumeration order: a mesh built from a REVERSED device list used to
    interleave lanes (per-host IO attributed to the wrong vehicles)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from flightjax.parallel import distributed

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs[::-1]), ("dp",))
    lanes = jnp.arange(len(devs) * 2, dtype=jnp.float32)
    sharded = jax.device_put(lanes, NamedSharding(mesh, P("dp")))
    got = distributed.process_local_lanes({"v": sharded})["v"]
    np.testing.assert_array_equal(got, np.asarray(lanes))


pytestmark = pytest.mark.fast
