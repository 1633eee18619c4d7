"""Input/output mappings for the C172 family: joystick -> inputs, JSON
telecommand <-> control-law inputs, X-Plane output.

Mirrors `c172s0.jl:14-50` (C172Sv0 T16000M mapping), `c172x1.jl:32-103`
(C172Xv1 mapping routing axes to control-law references), and the JSON3
telecommand round-trip of the control-law inputs
(`c172x_ctl.jl:522-533, 1035-1046`).
"""

import json

import jax.numpy as jnp
import numpy as np

from flightjax.io.devices import IOMapping, InputMappingError
from flightjax.io.joystick import exp_axis_curve
from flightjax.io.network import c172_xplane_messages


def elevator_curve(x):
    return exp_axis_curve(x, strength=1.0, deadzone=0.05)


def aileron_curve(x):
    return exp_axis_curve(x, strength=1.0, deadzone=0.05)


def rudder_curve(x):
    return exp_axis_curve(x, strength=1.5, deadzone=0.05)


# T16000M axis indices: 0 stick_x, 1 stick_y, 2 stick_z (twist), 3 throttle
_AX_X, _AX_Y, _AX_Z, _AX_THR = 0, 1, 2, 3
_HAT_UP, _HAT_RIGHT, _HAT_DOWN, _HAT_LEFT = 1, 2, 4, 8


class C172Sv0JoystickMapping(IOMapping):
    """T16000M -> mechanical actuation inputs (`c172s0.jl:21-50`)."""

    def assign_input(self, u, data):
        try:
            axes, btn = data["axes"], data["buttons"]
        except (KeyError, TypeError) as exc:
            raise InputMappingError(str(exc))
        act = dict(u["vehicle"]["systems"]["act"])
        act["throttle"] = jnp.asarray(0.5 * (1 - axes[_AX_THR]))
        act["aileron"] = jnp.asarray(aileron_curve(axes[_AX_X]))
        act["elevator"] = jnp.asarray(elevator_curve(axes[_AX_Y]))
        act["rudder"] = jnp.asarray(rudder_curve(axes[_AX_Z]))
        brake = float(btn.pressed[0])
        act["brake_left"] = jnp.asarray(brake)
        act["brake_right"] = jnp.asarray(brake)
        if btn.was_released[2]:
            act["flaps"] = jnp.clip(act["flaps"] + 0.3333, 0, 1)
        if btn.was_released[1]:
            act["flaps"] = jnp.clip(act["flaps"] - 0.3333, 0, 1)
        sys_u = dict(u["vehicle"]["systems"], act=act)
        return dict(u, vehicle=dict(u["vehicle"], systems=sys_u))


class C172Xv1JoystickMapping(IOMapping):
    """T16000M -> control-law references (`c172x1.jl:32-65`)."""

    Q_SF = 0.5
    P_SF = 0.5

    def assign_input(self, u, data):
        try:
            axes, btn = data["axes"], data["buttons"]
        except (KeyError, TypeError) as exc:
            raise InputMappingError(str(exc))
        lon = dict(u["avionics"]["lon"])
        lat = dict(u["avionics"]["lat"])
        pitch = elevator_curve(axes[_AX_Y])
        roll = aileron_curve(axes[_AX_X])
        yaw = rudder_curve(axes[_AX_Z])
        lon["throttle_axis"] = jnp.asarray(0.5 * (1 - axes[_AX_THR]))
        lon["elevator_axis"] = jnp.asarray(pitch)
        lon["q_ref"] = jnp.asarray(self.Q_SF * pitch)
        lat["aileron_axis"] = jnp.asarray(roll)
        lat["rudder_axis"] = jnp.asarray(yaw)
        lat["p_ref"] = jnp.asarray(self.P_SF * roll)
        av = dict(u["avionics"], lon=lon, lat=lat)
        return dict(u, avionics=av)


# ------------------------------------------------------- JSON telecommand

_LON_FIELDS = ("mode_req", "throttle_axis", "throttle_offset",
               "elevator_axis", "elevator_offset", "q_ref", "theta_ref",
               "EAS_ref", "clm_ref", "h_ref")
_LAT_FIELDS = ("mode_req", "aileron_axis", "aileron_offset", "rudder_axis",
               "rudder_offset", "p_ref", "beta_ref", "phi_ref", "chi_ref")


def ctl_u_to_json(u_av) -> str:
    """Control-law inputs -> JSON string (`c172x_ctl.jl:522-533`)."""
    out = {"lon": {}, "lat": {}}
    for k in _LON_FIELDS:
        v = u_av["lon"][k]
        out["lon"][k] = int(v) if k == "mode_req" else float(v)
    for k in _LAT_FIELDS:
        v = u_av["lat"][k]
        out["lat"][k] = int(v) if k == "mode_req" else float(v)
    return json.dumps(out)


def ctl_u_from_json(u_av, payload) -> dict:
    """Merge a JSON telecommand into the control-law inputs; unknown keys
    are rejected (`InputMappingError`), absent keys keep their values."""
    try:
        data = json.loads(payload) if isinstance(payload, (str, bytes)) \
            else payload
    except json.JSONDecodeError as exc:
        raise InputMappingError(f"bad JSON: {exc}")
    lon = dict(u_av["lon"])
    lat = dict(u_av["lat"])
    for side, fields, tgt in (("lon", _LON_FIELDS, lon),
                              ("lat", _LAT_FIELDS, lat)):
        for k, v in data.get(side, {}).items():
            if k not in fields:
                raise InputMappingError(f"unknown field {side}.{k}")
            tgt[k] = (jnp.asarray(int(v), dtype=jnp.int32)
                      if k == "mode_req" else jnp.asarray(float(v)))
    return dict(u_av, lon=lon, lat=lat)


class TelecommandMapping(IOMapping):
    """UDP JSON telecommand -> v1 avionics inputs (the loopback demo
    pattern, `c172_demos.jl:318-400`)."""

    def assign_input(self, u, data):
        av = ctl_u_from_json(u["avionics"], data)
        return dict(u, avionics=av)


class TelemetryMapping(IOMapping):
    """World snapshot -> one JSON telemetry line (the downlink side of the
    JSON loopback demo, `c172_demos.jl:318-400`)."""

    def extract_output(self, snapshot, y):
        kin = y.vehicle.kinematics
        return json.dumps({
            "t": float(snapshot.t),
            "h": float(kin.h_e),
            "EAS": float(y.vehicle.airflow.EAS),
            "psi": float(kin.e_nb[0]),
            "theta": float(kin.e_nb[1]),
            "phi": float(kin.e_nb[2]),
        })


class XPlaneOutputMapping(IOMapping):
    """World snapshot -> X-Plane 12 message set."""

    def extract_output(self, snapshot, y):
        return c172_xplane_messages(float(snapshot.t), y.vehicle)


# ------------------------------------------------------------ GUI dashboard

def c172x_dashboard(snapshot, y):
    """Widget frame for the C172X v1/v2 autopilot (the web-GUI analog of the
    reference's control-law GUI panels, `c172x_ctl.jl:715-726`): mode
    buttons post `lon_mode`/`lat_mode` events, reference sliders post
    `EAS_ref`/`clm_ref`/`chi_ref`, plus live flight instruments.

    `snapshot` is the latest SimState, `y` the world output (AircraftY)."""
    import numpy as np

    from flightjax.io import gui
    from flightjax.models.c172 import c172x_ctl as CTL

    veh = y.vehicle
    kin = veh.kinematics
    u_av = snapshot.u["avionics"]
    lon_u = u_av.get("ctl", u_av)["lon"] if "ctl" in u_av else u_av["lon"]
    lat_u = u_av.get("ctl", u_av)["lat"] if "ctl" in u_av else u_av["lat"]
    lon_req = int(lon_u["mode_req"])
    lat_req = int(lat_u["mode_req"])

    lon_modes = [("direct", CTL.LON_DIRECT), ("SAS", CTL.LON_SAS),
                 ("thr+q", CTL.LON_THR_Q), ("EAS+q", CTL.LON_EAS_Q),
                 ("EAS+clm", CTL.LON_EAS_CLM), ("EAS+alt", CTL.LON_EAS_ALT)]
    lat_modes = [("direct", CTL.LAT_DIRECT), ("SAS", CTL.LAT_SAS),
                 ("p+beta", CTL.LAT_P_BETA), ("phi+beta", CTL.LAT_PHI_BETA),
                 ("chi+beta", CTL.LAT_CHI_BETA)]

    frame = [gui.text(f"C172X  t = {float(snapshot.t):8.2f} s")]
    frame += [gui.mode_button(name, mode, lon_req, lon_req,
                              id=f"lon_mode:{mode}")
              for name, mode in lon_modes]
    frame += [gui.mode_button(name, mode, lat_req, lat_req,
                              id=f"lat_mode:{mode}")
              for name, mode in lat_modes]
    frame += [
        gui.display_bar("EAS (m/s)", veh.airflow.EAS, 20.0, 60.0),
        gui.display_bar("h_orth (m)", kin.h_o, 0.0, 5000.0),
        gui.display_bar("climb (m/s)", -kin.v_eb_n[2], -10.0, 10.0),
        gui.display_bar("bank (deg)", np.degrees(float(kin.e_nb[2])),
                        -60.0, 60.0),
        gui.safe_slider("EAS_ref", float(lon_u["EAS_ref"]), 25.0, 60.0,
                        id="EAS_ref"),
        gui.safe_slider("clm_ref", float(lon_u["clm_ref"]), -5.0, 5.0,
                        id="clm_ref"),
        gui.safe_slider("chi_ref", float(lat_u["chi_ref"]), -3.14, 3.14,
                        id="chi_ref"),
    ]
    return frame


class C172XDashboardMapping(IOMapping):
    """GUI <-> v1/v2 avionics: `extract_output` renders the dashboard,
    `assign_input` routes widget events onto the avionics inputs."""

    def _ctl_u(self, u):
        av = u["avionics"]
        return (av["ctl"], True) if "ctl" in av else (av, False)

    def assign_input(self, u, data):
        wid, val = data
        ctl_u, nested = self._ctl_u(u)
        lon, lat = dict(ctl_u["lon"]), dict(ctl_u["lat"])
        if wid.startswith("lon_mode:"):
            lon["mode_req"] = jnp.asarray(int(wid.split(":")[1]),
                                          dtype=jnp.int32)
        elif wid.startswith("lat_mode:"):
            lat["mode_req"] = jnp.asarray(int(wid.split(":")[1]),
                                          dtype=jnp.int32)
        elif wid in ("EAS_ref", "clm_ref", "h_ref"):
            lon[wid] = jnp.asarray(float(val))
        elif wid in ("chi_ref", "phi_ref", "beta_ref", "p_ref"):
            lat[wid] = jnp.asarray(float(val))
        else:
            raise InputMappingError(f"unknown widget {wid}")
        new_ctl = dict(ctl_u, lon=lon, lat=lat)
        av = (dict(u["avionics"], ctl=new_ctl) if nested else new_ctl)
        return dict(u, avionics=av)

    def extract_output(self, snapshot, y):
        return c172x_dashboard(snapshot, y)
