"""GUI renderer loopback tests (no browser, no external process).

Mirrors the reference's headless GUI smoke test (`test_gui.jl`) plus the
loopback style of `test_network.jl:22-197`: the web renderer is exercised
in-process through HTTP requests against an ephemeral port.
"""

import json
import threading
import urllib.request

import pytest

from flightjax.io import gui


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.read()


@pytest.fixture
def renderer():
    r = gui.Renderer(port=0, refresh=0.05)
    r.init()
    yield r
    r.shutdown()


@pytest.mark.fast
def test_widget_kit_shapes():
    frame = [
        gui.text("hello"),
        gui.dynamic_button("start", gui.HSV_green),
        gui.mode_button("EAS+alt", mode=8, requested=8, active=3),
        gui.toggle_switch("gear", True),
        gui.display_bar("throttle", 0.62, 0.0, 1.0),
        gui.safe_slider("elevator", -0.1, -1.0, 1.0),
        gui.safe_input("EAS ref", 40.0),
    ]
    kinds = [w["kind"] for w in frame]
    assert kinds == ["text", "button", "button", "toggle", "bar", "slider",
                     "input"]
    # mode_button coloring: requested-but-not-active must be amber
    assert frame[2]["color"] == gui._css(gui.HSV_amber)
    active = gui.mode_button("m", mode=2, requested=0, active=2)
    assert active["color"] == gui._css(gui.HSV_green)
    json.dumps(frame)  # must be JSON-serializable


@pytest.mark.fast
def test_page_and_frame_roundtrip(renderer):
    base = f"http://127.0.0.1:{renderer.port}"
    page = _get(base + "/").decode()
    assert "flightjax" in page and "/event" in page

    renderer.handle_data([gui.display_bar("h", 1234.5, 0.0, 5000.0)])
    frame = json.loads(_get(base + "/frame"))
    assert frame[0]["kind"] == "bar" and frame[0]["value"] == 1234.5


@pytest.mark.fast
def test_event_loopback(renderer):
    base = f"http://127.0.0.1:{renderer.port}"
    got = []
    th = threading.Thread(target=lambda: got.append(renderer.get_data()))
    th.start()
    _post(base + "/event", {"id": "throttle", "value": 0.8})
    th.join(timeout=5)
    assert got == [("throttle", 0.8)]
    # malformed events are tolerated, not fatal (`iodevices.jl:53-69`)
    _post(base + "/event", {"bogus": 1})
    _post(base + "/event", {"id": "mode_req", "value": 3})
    assert renderer.get_data() == ("mode_req", 3)


def test_f_draw_protocol(renderer):
    renderer.f_draw = lambda snap: [gui.display_bar("t", snap["t"], 0, 10)]
    renderer.handle_data({"t": 2.5})  # raw snapshot -> one draw frame
    base = f"http://127.0.0.1:{renderer.port}"
    frame = json.loads(_get(base + "/frame"))
    assert frame == [{"kind": "bar", "label": "t", "value": 2.5,
                      "lo": 0.0, "hi": 10.0}]


def test_interrupt_unblocks_get_data(renderer):
    got = []
    th = threading.Thread(target=lambda: got.append(renderer.get_data()))
    th.start()
    renderer.interrupt()
    th.join(timeout=5)
    assert got == [None] and renderer.should_close()


def test_canvas_widget():
    w = gui.canvas([{"line": [0, 0, 1, 1]},
                    {"circle": [0.5, 0.25, 0.06], "color": "#fff"},
                    {"poly": [0, 0, 1, 0, 0.5, 1]}], width=200, height=100)
    assert w["kind"] == "canvas" and w["w"] == 200
    assert w["shapes"][1]["color"] == "#fff"
    json.dumps(w)


def test_c172x_dashboard_and_mapping():
    """Dashboard frame renders from a real v1 world snapshot and widget
    events route onto the avionics inputs (the web analog of the
    reference's control-law GUI panels, `c172x_ctl.jl:715-726`)."""
    import jax.numpy as jnp

    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.c172 import c172x
    from flightjax.models.c172 import c172x_ctl as CTL
    from flightjax.models.c172.mappings import (C172XDashboardMapping,
                                                c172x_dashboard)
    from flightjax.physics.aircraftbase import SimpleWorld

    world = SimpleWorld(c172x.build_xv1("wa"))
    sim = Simulation(world, dt=0.02)
    x, u, s = world.init()
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x=x, u=u, s=s)
    y = sim.output(state)

    frame = c172x_dashboard(state, y)
    kinds = {w["kind"] for w in frame}
    assert kinds == {"text", "button", "bar", "slider"}
    json.dumps(frame)

    m = C172XDashboardMapping()
    u2 = m.assign_input(state.u, (f"lon_mode:{CTL.LON_EAS_CLM}", True))
    assert int(u2["avionics"]["lon"]["mode_req"]) == CTL.LON_EAS_CLM
    u3 = m.assign_input(u2, ("EAS_ref", 45.0))
    assert float(u3["avionics"]["lon"]["EAS_ref"]) == 45.0
    u4 = m.assign_input(u3, ("chi_ref", 1.0))
    assert float(u4["avionics"]["lat"]["chi_ref"]) == 1.0
    with pytest.raises(Exception):
        m.assign_input(u4, ("bogus_widget", 1.0))


# ------------------------------------------------------- generic inspector

@pytest.mark.fast
def test_inspector_robot2d_zero_model_code():
    """Inspector auto-generates a dashboard from the Robot2D output pytree:
    sections per group, sparklines for scalars, no per-model code
    (the `GUI.draw!`-everywhere analog, `gui.jl:243-246`)."""
    import jax.numpy as jnp

    from flightjax.core.sim import Simulation
    from flightjax.io.inspector import Inspector
    from flightjax.models.robot2d import Robot

    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    st = sim.init(u_m=0.1)
    y = sim.output(st)

    insp = Inspector()
    frame = insp.frame(y, t=st.t)
    kinds = {w["kind"] for w in frame}
    assert "text" in kinds and "section" in kinds
    # history accumulates across frames
    st2 = sim.step(st)
    frame2 = insp.frame(sim.output(st2), t=st2.t)

    def sparks(ws):
        for w in ws:
            if w["kind"] == "spark":
                yield w
            elif w["kind"] == "section":
                yield from sparks(w["children"])

    s1 = {w["label"]: len(w["values"]) for w in sparks(frame)}
    s2 = {w["label"]: len(w["values"]) for w in sparks(frame2)}
    assert s1 and all(s2[k] == n + 1 for k, n in s1.items())


def test_inspector_c172x_and_renderer_end_to_end(renderer):
    """Inspector over the full C172X v2 world output, served through a live
    Renderer: the /frame endpoint returns nested sections with control-law
    state visible — the reference's ctl debug window (`c172x_ctl.jl:715-726`)
    with zero per-model code."""
    import os

    from flightjax.models.c172.c172x_design import GAINS_PATH
    if not os.path.exists(GAINS_PATH):
        pytest.skip("gains not generated")

    from flightjax.core.sim import Simulation
    from flightjax.io.inspector import Inspector, InspectorMapping
    from flightjax.models.c172 import c172x, common as C172
    from flightjax.physics.aircraftbase import SimpleWorld

    aircraft = c172x.build_xv2("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=0.02, periodic_dt=0.02)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters(),
                                   periodic_dt=0.02)
    y = sim.output(state)

    renderer.f_draw = Inspector()
    data = InspectorMapping().extract_output(state, y)
    renderer.handle_data(data)

    frame = json.loads(_get(f"http://127.0.0.1:{renderer.port}/frame"))
    labels = set()

    def walk(ws):
        for w in ws:
            labels.add(w.get("label", ""))
            walk(w.get("children", []))

    walk(frame)
    # vehicle physics AND avionics internals are all inspectable
    assert "vehicle" in labels and "avionics" in labels
    assert any(lbl.startswith("EAS") for lbl in labels)
