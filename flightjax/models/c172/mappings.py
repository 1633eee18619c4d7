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
from flightjax.io.joystick import (GladiatorNXTEvoData, T16000MData,
                                   TWCSData, exp_axis_curve, is_pressed,
                                   was_released)
from flightjax.io.network import c172_xplane_messages


def elevator_curve(x):
    return exp_axis_curve(x, strength=1.0, deadzone=0.05)


def aileron_curve(x):
    return exp_axis_curve(x, strength=1.0, deadzone=0.05)


def rudder_curve(x):
    return exp_axis_curve(x, strength=1.5, deadzone=0.05)


# legacy dict-form T16000M axis indices: 0 stick_x, 1 stick_y, 2 stick_z
# (twist), 3 throttle (raw, unrescaled)
_AX_X, _AX_Y, _AX_Z, _AX_THR = 0, 1, 2, 3


def _stick_inputs(data):
    """(throttle [0,1], roll, pitch, yaw, brake, flaps_up_edge,
    flaps_down_edge, trim_edges) from any supported stick's typed data, with
    the reference's per-device button roles:

    - T16000M (`c172s0.jl:28-51`, `c172x1.jl:32-66`): brakes button_1,
      flaps up/down button_3/button_2, trim on the hat.
    - Gladiator NXT Evo (`c172x1.jl:69-104`): brakes F2 (+F3 right), flaps
      switch_down/switch_up, trim on the A4 hat.
    """
    ax = data.axes
    if isinstance(data, T16000MData):
        b = data.buttons
        brake_l = brake_r = float(is_pressed(b.button_1))
        flaps_up, flaps_dn = was_released(b.button_3), was_released(b.button_2)
        trim = data.hat
        yaw_axis = ax.stick_z
    else:  # GladiatorNXTEvoData
        b = data.buttons
        brake_l, brake_r = float(is_pressed(b.F2)), float(is_pressed(b.F3))
        flaps_up, flaps_dn = (was_released(b.switch_down),
                              was_released(b.switch_up))
        # A4 hat plays the trim role (`c172x1.jl:87-92`)
        from flightjax.io.joystick import HatButtons
        trim = HatButtons(up=b.A4_up, right=b.A4_right, down=b.A4_down,
                          left=b.A4_left)
        yaw_axis = ax.stick_z
    return dict(throttle=ax.throttle, roll=aileron_curve(ax.stick_x),
                pitch=elevator_curve(ax.stick_y),
                yaw=rudder_curve(yaw_axis), brake_l=brake_l, brake_r=brake_r,
                flaps_up=flaps_up, flaps_dn=flaps_dn, trim=trim)


def _legacy_stick_inputs(data):
    """Back-compat dict(axes, buttons, hat) form (generic devices)."""
    try:
        axes, btn = data["axes"], data["buttons"]
    except (KeyError, TypeError) as exc:
        raise InputMappingError(str(exc))
    from flightjax.io.joystick import Button, HatButtons
    brake = float(btn.pressed[0])
    return dict(throttle=0.5 * (1 - axes[_AX_THR]),
                roll=aileron_curve(axes[_AX_X]),
                pitch=elevator_curve(axes[_AX_Y]),
                yaw=rudder_curve(axes[_AX_Z]), brake_l=brake, brake_r=brake,
                flaps_up=bool(btn.was_released[2]),
                flaps_dn=bool(btn.was_released[1]),
                trim=HatButtons(Button(), Button(), Button(), Button()))


def _any_stick_inputs(data):
    if isinstance(data, (T16000MData, GladiatorNXTEvoData)):
        return _stick_inputs(data)
    if isinstance(data, TWCSData):
        return None  # handled by the throttle path
    return _legacy_stick_inputs(data)


class C172Sv0JoystickMapping(IOMapping):
    """Stick -> mechanical actuation inputs (`c172s0.jl:21-51`). Accepts
    T16000M / Gladiator NXT Evo typed data, the legacy dict form, and
    TWCSData as a PAIRED THROTTLE: a TWCS poll updates only throttle (and
    rudder from the rocker for pedal-less setups), leaving the stick's
    surface commands untouched."""

    TRIM_SF = 2e-4  # trim step per hat click (`c172s0.jl:43-46`)

    def assign_input(self, u, data):
        act = dict(u["vehicle"]["systems"]["act"])
        if isinstance(data, TWCSData):
            act["throttle"] = jnp.asarray(data.axes.throttle)
            act["rudder"] = jnp.asarray(rudder_curve(data.axes.rocker))
        else:
            d = _any_stick_inputs(data)
            act["throttle"] = jnp.asarray(d["throttle"])
            act["aileron"] = jnp.asarray(d["roll"])
            act["elevator"] = jnp.asarray(d["pitch"])
            act["rudder"] = jnp.asarray(d["yaw"])
            act["brake_left"] = jnp.asarray(d["brake_l"])
            act["brake_right"] = jnp.asarray(d["brake_r"])
            if d["flaps_up"]:
                act["flaps"] = jnp.clip(act["flaps"] + 0.3333, 0, 1)
            if d["flaps_dn"]:
                act["flaps"] = jnp.clip(act["flaps"] - 0.3333, 0, 1)
            t = d["trim"]
            sf = self.TRIM_SF
            d_ail = sf * (was_released(t.right) - was_released(t.left))
            d_elv = sf * (was_released(t.down) - was_released(t.up))
            if d_ail:
                act["aileron_offset"] = act["aileron_offset"] + d_ail
            if d_elv:
                act["elevator_offset"] = act["elevator_offset"] + d_elv
        sys_u = dict(u["vehicle"]["systems"], act=act)
        return dict(u, vehicle=dict(u["vehicle"], systems=sys_u))


class C172Xv1JoystickMapping(IOMapping):
    """Stick -> control-law references (`c172x1.jl:32-104`). Same device
    dispatch as C172Sv0JoystickMapping; trim clicks move the control-law
    offsets at 5e-3 per click and brakes/flaps act on the FBW actuation."""

    Q_SF = 0.5  # pitch rate sensitivity (`c172x1.jl:37`)
    P_SF = 0.5  # roll rate sensitivity
    TRIM_SF = 5e-3  # offset step per hat click (`c172x1.jl:50-57`)

    def _act_u(self, u):
        return u["vehicle"]["systems"]["act"]

    def assign_input(self, u, data):
        lon = dict(u["avionics"]["lon"])
        lat = dict(u["avionics"]["lat"])
        if isinstance(data, TWCSData):
            lon["throttle_axis"] = jnp.asarray(data.axes.throttle)
            lat["rudder_axis"] = jnp.asarray(rudder_curve(data.axes.rocker))
            av = dict(u["avionics"], lon=lon, lat=lat)
            return dict(u, avionics=av)
        d = _any_stick_inputs(data)
        lon["throttle_axis"] = jnp.asarray(d["throttle"])
        lon["elevator_axis"] = jnp.asarray(d["pitch"])
        lon["q_ref"] = jnp.asarray(self.Q_SF * d["pitch"])
        lat["aileron_axis"] = jnp.asarray(d["roll"])
        lat["rudder_axis"] = jnp.asarray(d["yaw"])
        lat["p_ref"] = jnp.asarray(self.P_SF * d["roll"])
        t, sf = d["trim"], self.TRIM_SF
        d_elv = sf * (was_released(t.down) - was_released(t.up))
        d_ail = sf * (was_released(t.right) - was_released(t.left))
        if d_elv:
            lon["elevator_offset"] = lon["elevator_offset"] + d_elv
        if d_ail:
            lat["aileron_offset"] = lat["aileron_offset"] + d_ail
        act = dict(self._act_u(u))
        act["brake_left"] = jnp.asarray(d["brake_l"])
        act["brake_right"] = jnp.asarray(d["brake_r"])
        if d["flaps_up"]:
            act["flaps"] = jnp.clip(act["flaps"] + 0.3333, 0, 1)
        if d["flaps_dn"]:
            act["flaps"] = jnp.clip(act["flaps"] - 0.3333, 0, 1)
        av = dict(u["avionics"], lon=lon, lat=lat)
        sys_u = dict(u["vehicle"]["systems"], act=act)
        return dict(u, avionics=av,
                    vehicle=dict(u["vehicle"], systems=sys_u))


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
