"""Host I/O tests (mirrors `test_network.jl`: in-process UDP loopbacks,
X-Plane message formats) + checkpoint round-trip + plots smoke test."""

import json
import struct
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.io import network as net
from flightjax.io.devices import IOMapping, InputMappingError


@pytest.mark.fast
def test_udp_loopback():
    """Output -> input through localhost (`test_network.jl:22-60`)."""
    rx = net.UDPInput(port=49390)
    tx = net.UDPOutput(port=49390)
    rx.init()
    tx.init()
    got = []

    def reader():
        got.append(rx.get_data())

    th = threading.Thread(target=reader)
    th.start()
    tx.handle_data(b"hello flightjax")
    th.join(timeout=2.0)
    assert got == [b"hello flightjax"]
    # EOT triggers shutdown request
    th = threading.Thread(target=reader)
    th.start()
    tx.sock.sendto(net.EOT, (rx.address, rx.port))
    th.join(timeout=2.0)
    assert got[-1] is None and rx.should_close()
    rx.interrupt()
    tx.shutdown()


@pytest.mark.fast
def test_json_loopback():
    """JSON telecommand round-trip (`c172_demos.jl:318-400` pattern)."""
    rx = net.UDPInput(port=49391)
    tx = net.UDPOutput(port=49391)
    rx.init()
    tx.init()
    cmd = {"lon": {"mode_req": 8, "EAS_ref": 45.0}, "lat": {"mode_req": 4}}
    got = []
    th = threading.Thread(target=lambda: got.append(rx.get_data()))
    th.start()
    tx.handle_data(json.dumps(cmd))
    th.join(timeout=2.0)
    assert json.loads(got[0]) == cmd
    rx.interrupt()
    tx.shutdown()


@pytest.mark.fast
def test_xplane_message_formats():
    """Byte-exact protocol checks (`network.jl:160-196`)."""
    msg = net.xpmsg_cmd("sim/operation/fix_all_systems")
    assert msg.startswith(b"CMND\0")

    dref = net.xpmsg_set_dref("sim/test/dref", 2.5)
    assert len(dref) == 509
    assert dref[:5] == b"DREF\0"
    assert struct.unpack("<f", dref[5:9])[0] == 2.5
    assert dref[9:22] == b"sim/test/dref"
    assert dref[22] == 0

    pose = net.xpmsg_set_pose(47.8, 13.0, 429.0, 157.0, 3.7, -0.5)
    assert pose[:5] == b"VEHS\0"
    assert len(pose) == 5 + 4 + 3 * 8 + 3 * 4
    vals = struct.unpack("<iddd3f", pose[5:])
    assert vals[0] == 0 and vals[1] == 47.8 and abs(vals[4] - 157.0) < 1e-6


def test_c172_xplane_output():
    from flightjax.models.c172 import c172s, common as C172
    vehicle = c172s.build_vehicle("wa")
    tp = C172.trim_parameters()
    ts = C172.TrimState(*[jnp.asarray(v) for v in C172.TRIM_X0])
    x, u, s = c172s.trim_assign(vehicle, tp, ts)
    _, y = vehicle.f_ode(x, u, s, 0.0)
    msgs = net.c172_xplane_messages(1.0, y)
    assert len(msgs) == 11
    assert all(isinstance(m, bytes) for m in msgs)
    assert msgs[-1][:5] == b"VEHS\0"


def test_checkpoint_roundtrip(tmp_path):
    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.robot2d import Robot
    from flightjax.utils.checkpoint import save_state, load_state

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.init(u_m=0.1)
    state = sim.step(state)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    restored = load_state(path)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed simulation continues identically
    s1 = sim.step(state)
    s2 = sim.step(restored)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax production path (async-capable, sharded-fleet ready): same
    bit-exact resume contract as the npz fallback."""
    pytest.importorskip("orbax.checkpoint")
    from flightjax.core.sim import Simulation
    from flightjax.models.robot2d import Robot
    from flightjax.utils.checkpoint import (load_state_orbax,
                                            save_state_orbax)

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.step(sim.init(u_m=0.1))
    path = str(tmp_path / "ckpt_orbax")
    save_state_orbax(path, state)
    restored = load_state_orbax(path, state)
    s1, s2 = sim.step(state), sim.step(restored)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plots_smoke(tmp_path):
    from flightjax.core.sim import Simulation
    from flightjax.models.robot2d import Robot
    from flightjax.utils.plots import make_plots, save_plots

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.init(u_m=0.05)
    _, ts = sim.run(state, t_end=1.0, save_every=10)
    plots = make_plots(ts)
    assert isinstance(plots, dict) and len(plots) > 0
    save_plots(plots, str(tmp_path / "plots"))
    import os
    pngs = [f for _, _, fs in os.walk(tmp_path / "plots") for f in fs]
    assert len(pngs) > 0


@pytest.mark.fast
def test_joystick_graceful_without_sdl():
    from flightjax.io.joystick import connected_joysticks, exp_axis_curve
    assert connected_joysticks() == [] or True  # no SDL on CI: empty list
    assert exp_axis_curve(0.0) == 0.0
    assert exp_axis_curve(1.0) == pytest.approx(1.0)
    assert abs(exp_axis_curve(0.5, strength=1.0)) < 0.5  # expo softens center
    assert exp_axis_curve(0.05, deadzone=0.1) == 0.0


def test_realtime_loop_headless():
    """RealTimeLoop drives the sim unpaced with an output device attached."""
    from flightjax.core.sim import Simulation
    from flightjax.models.robot2d import Robot
    from flightjax.io.realtime import RealTimeLoop

    class Sink(net.OutputDevice):
        def __init__(self):
            self.count = 0

        def init(self):
            pass

        def handle_data(self, data):
            self.count += 1

    class Mapping(IOMapping):
        def extract_output(self, state, y):
            return float(state.t)

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.init(u_m=0.0)
    loop = RealTimeLoop(sim, state)
    sink = Sink()
    loop.attach(sink, Mapping(), period=0.01)
    final = loop.run(t_end=0.5, pace=float("inf"))
    assert float(final.t) >= 0.5
    assert sink.count > 0


def test_telecommand_json_roundtrip():
    """ControlLaws u <-> JSON (`c172x_ctl.jl:522-533`)."""
    import os
    from flightjax.models.c172.c172x_design import GAINS_PATH
    if not os.path.exists(GAINS_PATH):
        pytest.skip("gains not generated")
    from flightjax.models.c172.c172x_ctl import ControlLaws, LON_EAS_ALT
    from flightjax.models.c172.mappings import (ctl_u_from_json,
                                                ctl_u_to_json)

    ctl = ControlLaws()
    u = ctl.init_u()
    # round trip preserves everything
    u2 = ctl_u_from_json(u, ctl_u_to_json(u))
    for side in ("lon", "lat"):
        for k in u[side]:
            assert float(u2[side][k]) == float(u[side][k]), (side, k)
    # partial update merges
    u3 = ctl_u_from_json(u, '{"lon": {"mode_req": 8, "EAS_ref": 45.0}}')
    assert int(u3["lon"]["mode_req"]) == LON_EAS_ALT
    assert float(u3["lon"]["EAS_ref"]) == 45.0
    assert float(u3["lat"]["chi_ref"]) == float(u["lat"]["chi_ref"])
    # malformed input rejected
    with pytest.raises(InputMappingError):
        ctl_u_from_json(u, '{"lon": {"bogus": 1}}')
    with pytest.raises(InputMappingError):
        ctl_u_from_json(u, 'not json')


def test_joystick_mapping_c172sv0():
    from flightjax.io.joystick import ButtonState
    from flightjax.models.c172 import c172s
    from flightjax.models.c172.mappings import C172Sv0JoystickMapping

    world = c172s.flagship_world("wa")
    # build a minimal u tree
    u = {"vehicle": world.aircraft.vehicle.init_u()}
    btn = ButtonState(pressed=np.zeros(16, bool),
                      was_pressed=np.zeros(16, bool),
                      was_released=np.zeros(16, bool))
    data = dict(axes=np.array([0.5, -0.5, 0.0, -1.0]), buttons=btn, hat=0)
    u2 = C172Sv0JoystickMapping().assign_input(u, data)
    act = u2["vehicle"]["systems"]["act"]
    assert float(act["throttle"]) == 1.0          # axis -1 -> full throttle
    assert float(act["aileron"]) > 0.1            # right stick -> right roll
    assert float(act["elevator"]) < -0.1
    with pytest.raises(InputMappingError):
        C172Sv0JoystickMapping().assign_input(u, {"bad": 1})


def test_specialized_plot_sets(tmp_path):
    """kin/air/dyn plot sets over a short C172 run save to PNG folders
    (mirrors `FlightPhysicsPlotsExt.jl` coverage)."""
    import jax
    import jax.numpy as jnp
    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.c172 import c172s
    from flightjax.utils.plots import kin_plots, air_plots, dyn_plots, \
        engine_plots, prop_plots, ldg_plots, pid_plots, save_plots

    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=0.02)
    x, u, s, _, _ = c172s.trim(world.aircraft.vehicle)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    _, log = sim.run(state, t_end=1.0, t0=0.0, save_every=5)

    veh = log.y.vehicle
    from flightjax.core.sim import TimeSeries
    plots = {
        "kin": kin_plots(TimeSeries(log.t, veh.kinematics)),
        "air": air_plots(TimeSeries(log.t, veh.airflow)),
        "dyn": dyn_plots(TimeSeries(log.t, veh.dynamics)),
        "engine": engine_plots(TimeSeries(log.t, veh.systems.pwp.engine)),
        "prop": prop_plots(TimeSeries(log.t, veh.systems.pwp.propeller)),
        # gear legs are stacked on axis 0 (left, right, nose) — slice nose
        "ldg": ldg_plots(TimeSeries(log.t, jax.tree.map(
            lambda a: a[:, 2], veh.systems.ldg))),
        "frc": pid_plots(TimeSeries(log.t, jax.tree.map(
            lambda a: a[:, 2], veh.systems.ldg.contact.frc))),
    }
    assert "Ob_t3d" in plots["kin"] and "speeds" in plots["air"]
    assert "shaft" in plots["engine"] and "power" in plots["prop"]
    assert "strut" in plots["ldg"] and "saturation" in plots["frc"]
    save_plots(plots, str(tmp_path / "plots"))
    pngs = list((tmp_path / "plots").rglob("*.png"))
    assert len(pngs) >= 24
