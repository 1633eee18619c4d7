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


def test_page_and_frame_roundtrip(renderer):
    base = f"http://127.0.0.1:{renderer.port}"
    page = _get(base + "/").decode()
    assert "flightjax" in page and "/event" in page

    renderer.handle_data([gui.display_bar("h", 1234.5, 0.0, 5000.0)])
    frame = json.loads(_get(base + "/frame"))
    assert frame[0]["kind"] == "bar" and frame[0]["value"] == 1234.5


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
