"""UDP devices + X-Plane 12 bridge.

Mirrors `/root/reference/lib/FlightCore/src/network.jl`:
- `UDPInput` binds and blocking-recvs; EOT (0x04) = shutdown request;
  `interrupt` closes the socket to unblock (`network.jl:19-59`)
- `UDPOutput` sends bytes/str/tuples, EOT on shutdown (`:68-97`)
- `XPlane12Control`: on init sends DREF overrides for pose / control
  surfaces / prop / nosewheel (`:120-135`); message builders `xpmsg_cmd`
  (CMND), `xpmsg_set_dref` (DREF + float32 + dref id padded to 509 B,
  `:171-182`), `xpmsg_set_pose` (VEHS + lat/lon/h f64 + psi/theta/phi f32,
  `:185-196`); default pose = LOWS runway 15 (`:147-154`)
and the C172 control-surface/prop/steering DREF output set
(`c172.jl:954-992`).
"""

import socket
import struct
import time

import numpy as np

from flightjax.io.devices import InputDevice, OutputDevice

EOT = b"\x04"


class UDPInput(InputDevice):
    def __init__(self, address="127.0.0.1", port=49017, bufsize=16384):
        self.address = address
        self.port = port
        self.bufsize = bufsize
        self.sock = None
        self._closed = False

    def init(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((self.address, self.port))
        self._closed = False

    def get_data(self):
        """Blocking recv; returns None on EOT or closed socket."""
        try:
            data, _ = self.sock.recvfrom(self.bufsize)
        except OSError:
            return None
        if data == EOT:
            self._closed = True
            return None
        return data

    def should_close(self):
        return self._closed

    def interrupt(self):
        if self.sock is not None:
            try:
                self.sock.close()
            except OSError:
                pass

    shutdown = interrupt


class UDPOutput(OutputDevice):
    def __init__(self, address="127.0.0.1", port=49000):
        self.address = address
        self.port = port
        self.sock = None

    def init(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def handle_data(self, data):
        if data is None:
            return
        if isinstance(data, (tuple, list)):
            for d in data:
                self.handle_data(d)
            return
        if isinstance(data, str):
            data = data.encode("latin-1")
        self.sock.sendto(data, (self.address, self.port))

    def shutdown(self):
        if self.sock is not None:
            try:
                self.sock.sendto(EOT, (self.address, self.port))
                self.sock.close()
            except OSError:
                pass


# --------------------------------------------------------- X-Plane messages

def xpmsg_cmd(cmd_id: str) -> bytes:
    """CMND message (`network.jl:160-168`)."""
    return b"CMND\0" + cmd_id.encode("ascii")


def xpmsg_set_dref(dref_id: str, value) -> bytes:
    """DREF message padded to 509 bytes (`network.jl:171-182`)."""
    did = dref_id.encode("ascii")
    return (b"DREF\0" + struct.pack("<f", float(value)) + did + b"\0"
            + b"\0" * (499 - len(did)))


def xpmsg_set_pose(lat_deg, lon_deg, h_m, psi_deg, theta_deg, phi_deg,
                   aircraft=0) -> bytes:
    """VEHS pose message (`network.jl:185-196`)."""
    return b"VEHS\0" + struct.pack("<iddd fff".replace(" ", ""),
                                   int(aircraft), float(lat_deg),
                                   float(lon_deg), float(h_m),
                                   float(psi_deg), float(theta_deg),
                                   float(phi_deg))


def xplane_pose_from_kin(kin) -> bytes:
    """KinData -> VEHS message (`kinematics.jl:483-497`)."""
    return xpmsg_set_pose(
        np.rad2deg(float(kin.lat)), np.rad2deg(float(kin.lon)),
        float(kin.h_e), np.rad2deg(float(kin.e_nb[0])),
        np.rad2deg(float(kin.e_nb[1])), np.rad2deg(float(kin.e_nb[2])))


# LOWS runway 15 (`network.jl:147-154`)
XPLANE_POSE_DEFAULT = dict(lat_deg=47.80433, lon_deg=12.997, h_m=429.0,
                           psi_deg=157.0, theta_deg=3.7, phi_deg=-0.5)

_C172_DREFS = dict(
    elev_left_pos="sim/flightmodel2/wing/elevator1_deg[8]",
    elev_right_pos="sim/flightmodel2/wing/elevator1_deg[9]",
    flap_left_pos="sim/flightmodel2/wing/flap1_deg[0]",
    flap_right_pos="sim/flightmodel2/wing/flap1_deg[1]",
    rudder_pos="sim/flightmodel2/wing/rudder1_deg[10]",
    ail_left_pos="sim/flightmodel2/wing/aileron1_deg[2]",
    ail_right_pos="sim/flightmodel2/wing/aileron1_deg[3]",
    prop_is_disc="sim/flightmodel2/engines/prop_is_disc[0]",
    prop_angle="sim/flightmodel2/engines/prop_rotation_angle_deg[0]",
    nws_angle="sim/flightmodel2/gear/tire_steer_actual_deg[0]",
)


def c172_xplane_messages(t, veh_y) -> tuple:
    """Full C172 visualization message set (`c172.jl:954-992`)."""
    r2d = np.rad2deg
    aero = veh_y.systems.aero
    de, da, dr, df = (float(aero.de), float(aero.da), float(aero.dr),
                      float(aero.df))
    psi_sw = float(veh_y.systems.ldg.strut.psi_sw[2])  # nose leg
    omega_prop = float(veh_y.systems.pwp.propeller.omega)
    phi_prop = np.mod(omega_prop * float(t), 2 * np.pi)
    d = _C172_DREFS
    return (
        xpmsg_set_dref(d["elev_left_pos"], r2d(de)),
        xpmsg_set_dref(d["elev_right_pos"], r2d(de)),
        xpmsg_set_dref(d["ail_left_pos"], r2d(da)),
        xpmsg_set_dref(d["ail_right_pos"], r2d(-da)),
        xpmsg_set_dref(d["flap_left_pos"], r2d(df)),
        xpmsg_set_dref(d["flap_right_pos"], r2d(df)),
        xpmsg_set_dref(d["rudder_pos"], r2d(dr)),
        xpmsg_set_dref(d["prop_is_disc"], 1.0 if omega_prop > 10 else 0.0),
        xpmsg_set_dref(d["prop_angle"], r2d(phi_prop)),
        xpmsg_set_dref(d["nws_angle"], r2d(psi_sw)),
        xplane_pose_from_kin(veh_y.kinematics),
    )


class XPlane12Control(OutputDevice):
    """X-Plane 12 output bridge (`network.jl:107-142`)."""

    _OVERRIDES = (
        "sim/operation/override/override_planepath[0]",
        "sim/operation/override/override_control_surfaces[0]",
        "sim/flightmodel2/engines/prop_disc/override[0]",
        "sim/operation/override/override_wheel_steer[0]",
    )

    def __init__(self, address="127.0.0.1", port=49000):
        self.address, self.port = address, port
        self.udp = UDPOutput(address, port)
        self._native = None

    def init(self):
        # prefer the native batched sender (one FFI hop per visualization
        # frame); fall back to the Python socket path
        try:
            from flightjax.io import native
            if native.available():
                self._native = native.UdpBatchSender(self.address, self.port)
        except Exception:
            self._native = None
        if self._native is None:
            self.udp.init()
        self.handle_data(tuple(xpmsg_set_dref(d, 1)
                               for d in self._OVERRIDES))

    def handle_data(self, data):
        time.sleep(0.01)  # give X-Plane breathing room (`network.jl:140`)
        packets = data if isinstance(data, (tuple, list)) else (data,)
        if self._native is not None:
            self._native.send([p if isinstance(p, bytes) else str(p).encode()
                               for p in packets])
        else:
            self.udp.handle_data(data)

    def shutdown(self):
        if self._native is not None:
            self._native.close()
        else:
            self.udp.shutdown()
