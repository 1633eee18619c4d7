"""C172X guidance laws: segment (leg) guidance commanding the control laws.

Mirrors `/root/reference/lib/FlightApps/src/c172/c172x/guidance/
c172x_gdc.jl`:
- `Segment` between two geographic points and the segment-relative data
  (along/cross-track, vertical deviation, azimuth/inclination —
  `c172x_gdc.jl:37-148`)
- lateral law: intercept angle dchi = -dchi_inf * (2/pi) * atan(e/e_sf) ->
  chi_ref (`:243-244`)
- vertical law: h_ref from the nominal segment altitude, gated by the
  cross-track threshold (`:245-249`)
- mode machine direct/segment(/circular stub) that overrides the
  ControlLaws' lateral/longitudinal mode requests (`:297-329`)
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from flightjax.ops import attitude as att
from flightjax.ops import geodesy as geo
from flightjax.ops.quaternions import qrot_inv
from flightjax.models.c172 import c172x_ctl as CTL

GDC_DIRECT, GDC_SEGMENT, GDC_CIRCULAR = 0, 1, 2


class Segment(NamedTuple):
    """Two geographic endpoints (n-vector + ellipsoidal altitude)."""
    n_e1: jnp.ndarray
    h_e1: jnp.ndarray
    n_e2: jnp.ndarray
    h_e2: jnp.ndarray


def segment(lat1, lon1, h1, lat2, lon2, h2):
    return Segment(
        n_e1=geo.nvector_from_latlon(jnp.asarray(lat1), jnp.asarray(lon1)),
        h_e1=jnp.asarray(float(h1)),
        n_e2=geo.nvector_from_latlon(jnp.asarray(lat2), jnp.asarray(lon2)),
        h_e2=jnp.asarray(float(h2)))


def segment_from_vector(lat1, lon1, h1, chi, s, gamma=None, dh=None):
    """Endpoint from origin + course/length (+ slope) (`c172x_gdc.jl:62-88`)."""
    if dh is None:
        dh = s * np.tan(gamma)
    n_e1 = geo.nvector_from_latlon(jnp.asarray(lat1), jnp.asarray(lon1))
    q_en1 = geo.ltf(n_e1)
    r_12_n = jnp.asarray([s * np.cos(chi), s * np.sin(chi), 0.0])
    from flightjax.ops.quaternions import qrot
    r_e2_e = geo.cartesian_from_geographic(n_e1, jnp.asarray(float(h1))) \
        + qrot(q_en1, r_12_n)
    n_e2, _ = geo.geographic_from_cartesian(r_e2_e)
    lat2, lon2 = geo.latlon_from_nvector(n_e2)
    return segment(lat1, lon1, h1, float(lat2), float(lon2), float(h1) + dh)


def reversed_segment(seg: Segment) -> Segment:
    """Swap endpoints — the reference's unary `-Segment`
    (`c172x_gdc.jl:92-94`), used to build approach legs ending AT a point."""
    return Segment(n_e1=seg.n_e2, h_e1=seg.h_e2, n_e2=seg.n_e1,
                   h_e2=seg.h_e1)


def segment_latlon(n_e):
    """Host-side (lat, lon) floats of a segment endpoint n-vector."""
    lat, lon = geo.latlon_from_nvector(n_e)
    return float(lat), float(lon)


class SegmentData(NamedTuple):
    """Segment-relative coordinates (`c172x_gdc.jl:102-148`)."""
    chi_12: jnp.ndarray
    gamma_12: jnp.ndarray
    s_12: jnp.ndarray
    s_1b: jnp.ndarray
    s_2b: jnp.ndarray
    e_sb: jnp.ndarray
    v_sb: jnp.ndarray
    h_s: jnp.ndarray


def segment_data(seg: Segment, n_e_b, h_e_b) -> SegmentData:
    r_e1 = geo.cartesian_from_geographic(seg.n_e1, seg.h_e1)
    r_e2 = geo.cartesian_from_geographic(seg.n_e2, seg.h_e2)
    r_eb = geo.cartesian_from_geographic(n_e_b, h_e_b)
    q_en = geo.ltf(n_e_b)

    r_1b_n = qrot_inv(q_en, r_eb - r_e1)
    r_12_n = qrot_inv(q_en, r_e2 - r_e1)
    r_1b_h = r_1b_n.at[2].set(0.0)
    r_12_h = r_12_n.at[2].set(0.0)

    s_12 = jnp.sqrt(jnp.sum(r_12_h**2) + 1e-12)
    u_12 = r_12_h / s_12
    s_1b = jnp.sum(u_12 * r_1b_h, axis=-1)
    s_2b = s_1b - s_12
    e_sb = jnp.cross(u_12, r_1b_h)[2]

    h_s = seg.h_e1 + (seg.h_e2 - seg.h_e1) * s_1b / s_12
    v_sb = h_e_b - h_s
    chi_12 = att.azimuth(u_12)
    gamma_12 = jnp.arctan2(seg.h_e2 - seg.h_e1, s_12)
    return SegmentData(chi_12=chi_12, gamma_12=gamma_12, s_12=s_12,
                       s_1b=s_1b, s_2b=s_2b, e_sb=e_sb, v_sb=v_sb, h_s=h_s)


class Circle(NamedTuple):
    """Loiter circle: geographic center, radius and turn direction
    (+1 = clockwise viewed from above / right-hand orbit, -1 = CCW)."""
    n_e: jnp.ndarray
    h_e: jnp.ndarray
    radius: jnp.ndarray
    turn_dir: jnp.ndarray


def circle(lat, lon, h, radius, turn_dir=1.0):
    return Circle(
        n_e=geo.nvector_from_latlon(jnp.asarray(lat), jnp.asarray(lon)),
        h_e=jnp.asarray(float(h)), radius=jnp.asarray(float(radius)),
        turn_dir=jnp.asarray(float(turn_dir)))


class CircleData(NamedTuple):
    """Circle-relative coordinates: bearing of the vehicle from the center
    `sigma`, horizontal center distance `d_cb`, radial (cross-track) error
    `e_cb = d_cb - radius` (positive outside), vertical deviation `v_cb`,
    and the local tangent course `chi_tan`."""
    sigma: jnp.ndarray
    d_cb: jnp.ndarray
    e_cb: jnp.ndarray
    v_cb: jnp.ndarray
    chi_tan: jnp.ndarray


def circle_data(crc: Circle, n_e_b, h_e_b) -> CircleData:
    """Vehicle position in circle coordinates, via the same local-NED(Ob)
    projection as `segment_data`."""
    r_ec = geo.cartesian_from_geographic(crc.n_e, crc.h_e)
    r_eb = geo.cartesian_from_geographic(n_e_b, h_e_b)
    q_en = geo.ltf(n_e_b)
    r_cb_n = qrot_inv(q_en, r_eb - r_ec)
    r_cb_h = r_cb_n.at[2].set(0.0)
    d_cb = jnp.sqrt(jnp.sum(r_cb_h**2) + 1e-12)
    sigma = att.azimuth(r_cb_h)
    chi_tan = att.wrap_to_pi(sigma + crc.turn_dir * (np.pi / 2))
    return CircleData(sigma=sigma, d_cb=d_cb, e_cb=d_cb - crc.radius,
                      v_cb=h_e_b - crc.h_e, chi_tan=chi_tan)


class GdcY(NamedTuple):
    mode: jnp.ndarray
    data: SegmentData
    crc_data: CircleData
    dchi: jnp.ndarray
    chi_ref: jnp.ndarray
    h_ref: jnp.ndarray
    hor_gdc: jnp.ndarray
    vrt_gdc: jnp.ndarray


class GuidanceLaws:
    """Segment + circular guidance component (`c172x_gdc.jl:226-338`;
    the reference's CircularGuidance is an empty stub emitting a warning,
    `c172x_gdc.jl:256-268` — the circular law here is a real loiter mode)."""

    DCHI_INF = np.pi / 2  # intercept angle at infinite cross-track error
    E_SF = 250.0          # cross-track scaling (m)
    E_THR = 1000.0        # cross-track gate for vertical guidance (m)

    def init_u(self):
        return {
            "mode_req": jnp.asarray(GDC_DIRECT, dtype=jnp.int32),
            "target": segment(0.0, 0.0, 0.0, 1e-3, 0.0, 0.0),
            "orbit": circle(0.0, 0.0, 0.0, 1000.0),
            "hor_gdc_req": jnp.asarray(False),
            "vrt_gdc_req": jnp.asarray(False),
        }

    def f_periodic(self, u, veh_y) -> GdcY:
        """Compute guidance references and activity flags
        (`c172x_gdc.jl:258-283, 297-329`)."""
        kin = veh_y.kinematics
        data = segment_data(u["target"], kin.n_e, kin.h_e)

        dchi = -self.DCHI_INF / (np.pi / 2) * jnp.arctan(data.e_sb / self.E_SF)
        chi_seg = att.wrap_to_pi(data.chi_12 + dchi)

        # circular (loiter) law: course = local tangent, rotated toward the
        # circle by an atan capture term. At e -> +inf the correction
        # saturates at turn_dir*pi/2, i.e. chi_ref = sigma + turn_dir*pi =
        # pointing straight AT the center; at e = 0 it is the pure tangent.
        crc = u["orbit"]
        cdata = circle_data(crc, kin.n_e, kin.h_e)
        dchi_crc = crc.turn_dir * self.DCHI_INF / (np.pi / 2) \
            * jnp.arctan(cdata.e_cb / self.E_SF)
        chi_crc = att.wrap_to_pi(cdata.chi_tan + dchi_crc)

        mode = jnp.where(CTL.is_on_gnd(veh_y), GDC_DIRECT,
                         u["mode_req"]).astype(jnp.int32)
        seg_on = mode == GDC_SEGMENT
        crc_on = mode == GDC_CIRCULAR
        law_on = jnp.logical_or(seg_on, crc_on)

        chi_ref = jnp.where(crc_on, chi_crc, chi_seg)
        h_ref = jnp.where(crc_on, crc.h_e, data.h_s)
        e_lat = jnp.where(crc_on, cdata.e_cb, data.e_sb)

        hor = jnp.logical_and(law_on, u["hor_gdc_req"])
        vrt = jnp.logical_and(
            law_on, jnp.logical_and(u["vrt_gdc_req"],
                                    jnp.abs(e_lat) < self.E_THR))
        return GdcY(mode=mode, data=data, crc_data=cdata,
                    dchi=jnp.where(crc_on, dchi_crc, dchi),
                    chi_ref=chi_ref, h_ref=h_ref, hor_gdc=hor, vrt_gdc=vrt)

    def override_ctl_u(self, ctl_u, gdc_y: GdcY):
        """Guidance commands the control laws (`c172x_gdc.jl:301-312`)."""
        lat = dict(ctl_u["lat"])
        lon = dict(ctl_u["lon"])
        lat["chi_ref"] = jnp.where(gdc_y.hor_gdc, gdc_y.chi_ref,
                                   lat["chi_ref"])
        lat["mode_req"] = jnp.where(gdc_y.hor_gdc, CTL.LAT_CHI_BETA,
                                    lat["mode_req"]).astype(jnp.int32)
        lon["h_ref"] = jnp.where(gdc_y.vrt_gdc, gdc_y.h_ref, lon["h_ref"])
        lon["mode_req"] = jnp.where(gdc_y.vrt_gdc, CTL.LON_EAS_ALT,
                                    lon["mode_req"]).astype(jnp.int32)
        return dict(ctl_u, lat=lat, lon=lon)


class Avionics:
    """v2 avionics = GuidanceLaws + ControlLaws; guidance runs first and
    overrides the control-law requests (`c172x2.jl:18-42`)."""

    def __init__(self, gains=None):
        self.ctl = CTL.ControlLaws(gains)
        self.gdc = GuidanceLaws()

    def init_u(self):
        return {"ctl": self.ctl.init_u(), "gdc": self.gdc.init_u()}

    def init_s(self):
        return {"ctl": self.ctl.init_s()}

    def f_periodic(self, s, u, veh_y, dt):
        gdc_y = self.gdc.f_periodic(u["gdc"], veh_y)
        ctl_u = self.gdc.override_ctl_u(u["ctl"], gdc_y)
        s_ctl, ctl_y = self.ctl.f_periodic(s["ctl"], ctl_u, veh_y, dt)
        return {"ctl": s_ctl}, {"ctl": ctl_y, "gdc": gdc_y}

    def assign(self, u_systems, av_y):
        return self.ctl.assign(u_systems, av_y["ctl"])

    def output(self, s, u, veh_y):
        return self.ctl.output(s["ctl"], u["ctl"], veh_y)

    def init_from_trim(self, veh_y, dt):
        ctl_u, ctl_s = self.ctl.init_from_trim(veh_y, dt)
        return ({"ctl": ctl_u, "gdc": self.gdc.init_u()}, {"ctl": ctl_s})
