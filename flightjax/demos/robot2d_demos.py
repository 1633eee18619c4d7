"""Robot2D demo scenario.

Mirrors `/root/reference/lib/FlightApps/demos/robot2d_demos.jl`: run the
self-balancing robot for 100 s (dt=0.01, periodic 0.02) from the default
initialization, optionally with the live web dashboard, and return the
(v_ref, v) tracking time series for plotting.
"""

import jax.numpy as jnp

from flightjax.core.sim import Simulation
from flightjax.models.robot2d import Robot


def robot2d_sim(t_end=100.0, v_ref=0.5, gui=False, gui_port=8085):
    """Velocity-mode tracking run. Returns (final_state, log) where
    log.y.vehicle exposes the tracked signals. With gui=True a
    web dashboard on `gui_port` shows the live state (Ctrl-C to stop)."""
    robot = Robot()
    sim = Simulation(robot, dt=0.01, periodic_dt=0.02)
    state = sim.init()

    # request velocity mode (`robot2d_demos.jl` uses the GUI for this)
    u = dict(state.u, ctl=dict(state.u["ctl"],
                                mode=jnp.asarray(1, dtype=jnp.int32),
                                v_ref=jnp.asarray(float(v_ref))))
    state = state._replace(u=u)

    if not gui:
        return sim.run(state, t_end=t_end, t0=0.0, save_every=2)

    from flightjax.io import gui as G
    from flightjax.io.devices import IOMapping
    from flightjax.io.realtime import RealTimeLoop

    import math

    def f_draw(data):
        """Live dashboard incl. the robot side-view canvas — wheel + tilted
        body, mirroring the reference's ImGui draw list
        (`robot2d.jl:141-199`)."""
        snapshot, y = data
        eta = float(y.vehicle.eta)
        th = float(y.vehicle.theta)
        cx = 0.5 + 0.1 * (eta - round(eta / 2.0) * 2.0)  # wrap view
        cy, r, L = 0.25, 0.06, 0.35
        tip = (cx + L * math.sin(th), cy + L * math.cos(th))
        shapes = [
            {"line": [0.0, cy - r, 1.0, cy - r], "color": "#4a5160"},
            {"circle": [cx, cy, r]},
            {"line": [cx, cy, tip[0], tip[1]], "color": "#d9b44a"},
        ]
        return [
            G.text(f"robot2d  t = {float(snapshot.t):7.2f} s"),
            G.canvas(shapes),
            G.display_bar("v (m/s)", y.vehicle.v, -2.0, 2.0),
            G.display_bar("theta (rad)", y.vehicle.theta, -0.8, 0.8),
            G.safe_slider("v_ref", float(snapshot.u["ctl"]["v_ref"]),
                          -1.0, 1.0, id="v_ref"),
        ]

    class Mapping(IOMapping):
        def assign_input(self, u, data):
            wid, val = data
            if wid != "v_ref":
                return u
            return dict(u, ctl=dict(u["ctl"], v_ref=jnp.asarray(float(val))))

        def extract_output(self, snapshot, y):
            return (snapshot, y)

    renderer = G.Renderer(port=gui_port, f_draw=f_draw)
    renderer.init()  # bind now so the URL is known before the run starts
    loop = RealTimeLoop(sim, state)
    loop.attach(renderer, Mapping(), period=0.1)
    print(f"robot2d dashboard: http://127.0.0.1:{renderer.port}/")
    final = loop.run(t_end=t_end, pace=1.0)
    return final, None
