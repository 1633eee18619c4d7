"""Landing gear: strut geometry + contact friction, branch-free.

Mirrors `/root/reference/lib/FlightPhysics/src/landinggear.jl`:
- `SimpleDamper` spring + asymmetric damper (`landinggear.jl:138-153`)
- `FrictionCoefficients` static->dynamic velocity blending (`:157-193`)
- `Strut`: ground-intersection weight-on-wheel test from the natural-length
  wheel endpoint vs terrain ellipsoidal height (`:228-255`), contact-frame
  construction from steering azimuth + terrain normal (`:286-307`), damper
  elongation rate cancelling the contact-normal velocity (`:309-315`)
- `Contact`: rolling/skidding friction, slip-angle-dependent lateral mu,
  braking interpolation, friction constraint via a PI regulator nulling the
  contact-point velocity (`:411-476`); regulator reset when airborne
  (`:479-483`)
- crash detection thresholds (`:331-347`) surface as a `crashed` flag for
  the vehicle's termination mask instead of a thrown exception.

The reference's early-return on `wow == false` (`:255-258`) becomes a
`jnp.where` mask selecting the documented wow-false defaults; every
intermediate is NaN-guarded so the untaken path stays finite (and so
`jax.jacobian` through an airborne vehicle stays clean).
"""

import contextlib
import contextvars
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component, bwhere, match_vma
from flightjax.ops.quaternions import qmul, qconj, qrot, qrot_inv
from flightjax.ops import attitude as att
from flightjax.physics import control as C
from flightjax.physics.dynamics import Wrench, FrameTransform, translate_wrench
from flightjax.physics.terrain import TerrainData
from flightjax.physics.kinematics import KinData

E1 = np.array([1.0, 0.0, 0.0])
E3 = np.array([0.0, 0.0, 1.0])

# crash thresholds (`landinggear.jl:336-343`)
ALPHA_TS_MAX = np.deg2rad(60.0)
XI_DOT_MAX = 10.0

# Trace-scoped fleet-level gear gate (same pattern as
# `aircraftbase.geoid_deferred`): when set to a SCALAR boolean tracer,
# `GearSet.f_ode/f_step` wrap the strut/contact math in a `lax.cond` on it —
# True runs the full path, False the airborne branch (exact wow=false
# defaults). The predicate must be conservative: True whenever ANY lane
# could have weight on wheel this step. `Simulation.fleet_step` computes it
# as `any(h_agl < margin)`, a scalar under vmap, so the cond genuinely skips
# the gear math at runtime when the whole fleet is airborne (measured 56
# us/fleet-step at batch 4096 — tools/exp_gearskip.py).
_gear_gate = contextvars.ContextVar("flightjax_gear_gate", default=None)


@contextlib.contextmanager
def gear_gated(active):
    """Scope in which GearSet evaluation is `lax.cond`-gated on the scalar
    `active` (True = full strut/contact math must run)."""
    token = _gear_gate.set(active)
    try:
        yield
    finally:
        _gear_gate.reset(token)


class SimpleDamper(NamedTuple):
    k_s: float = 25000.0
    k_d_ext: float = 1000.0
    k_d_cmp: float = 1000.0
    F_max: float = 50000.0


def damper_force(d: SimpleDamper, xi, xi_dot):
    """Axial damper force along strut z (`landinggear.jl:149-153`)."""
    k_d = jnp.where(xi_dot > 0, d.k_d_ext, d.k_d_cmp)
    return -(d.k_s * xi + k_d * xi_dot)


# ------------------------------------------------------------------ friction

def _dot(a, b):
    """Inner product as multiply+reduce: a zero-non-contracting dot_general
    hits a Mosaic parser bug inside Pallas kernels."""
    return jnp.sum(a * b, axis=-1)


def _mu_blend(mu_s, mu_d, v_s, v_d, v):
    """Static->dynamic friction blend over contact speed (`:170-174`)."""
    k_sd = jnp.clip((v - v_s) / (v_d - v_s), 0.0, 1.0)
    return k_sd * mu_d + (1.0 - k_sd) * mu_s


# rolling coefficients are surface-independent (`:180-181`)
_ROLL = (0.03, 0.02, 0.005, 0.01)
# skidding coefficients per surface code {dry, wet, icy} (`:183-193`)
_SKID_MU_S = np.array([0.75, 0.25, 0.075])
_SKID_MU_D = np.array([0.25, 0.15, 0.025])
_SKID_V = (0.005, 0.01)


def mu_roll(v):
    mu_s, mu_d, v_s, v_d = _ROLL
    return _mu_blend(mu_s, mu_d, v_s, v_d, v)


def mu_skid(surface, v):
    # 3-way select instead of indexing the constant tables: branch-free and
    # gather-free (gathers do not lower inside the Pallas megakernel)
    def pick(tbl):
        return jnp.where(surface == 0, tbl[0],
                         jnp.where(surface == 1, tbl[1], tbl[2]))
    return _mu_blend(pick(_SKID_MU_S), pick(_SKID_MU_D), *_SKID_V, v)


# --------------------------------------------------------------------- strut

class StrutY(NamedTuple):
    """Strut snapshot (`landinggear.jl:210-222`); defaults are the wow=false
    values."""
    delta_h: jnp.ndarray
    wow: jnp.ndarray
    xi: jnp.ndarray
    xi_dot: jnp.ndarray
    F_dmp_zs: jnp.ndarray
    psi_sw: jnp.ndarray
    alpha_ts: jnp.ndarray
    r_sc_s: jnp.ndarray     # contact frame origin wrt strut frame
    q_sc: jnp.ndarray
    r_bc_b: jnp.ndarray     # contact frame origin wrt body frame
    q_bc: jnp.ndarray
    v_ec_xy: jnp.ndarray
    trn: TerrainData


class ContactY(NamedTuple):
    mu_roll: jnp.ndarray
    mu_skid: jnp.ndarray
    kappa_br: jnp.ndarray
    psi_cv: jnp.ndarray
    mu_max: jnp.ndarray
    mu_eff: jnp.ndarray
    f_c: jnp.ndarray
    F_c: jnp.ndarray
    wr_b: Wrench
    frc: C.PIOutput


class GearUnitY(NamedTuple):
    strut: StrutY
    contact: ContactY
    crashed: jnp.ndarray


def _safe_norm(v, eps=1e-12):
    return jnp.sqrt(jnp.sum(v * v) + eps)


def _safe_atan2(y, x, eps=1e-9):
    """atan2 with NaN-free gradient at the origin (double-where trick)."""
    near_zero = jnp.logical_and(jnp.abs(x) < eps, jnp.abs(y) < eps)
    x_safe = jnp.where(near_zero, 1.0, x)
    y_safe = jnp.where(near_zero, 0.0, y)
    return jnp.where(near_zero, 0.0, jnp.arctan2(y_safe, x_safe))


class LandingGearUnit(Component):
    """One gear leg = steering + braking + strut + contact
    (`landinggear.jl:513-552`).

    steering: None (no steering) or dict(psi_max=...) for DirectSteering;
    braking: None (no braking) or dict(eta_br=...) for DirectBraking.
    The unit's u always carries {steering, braking} scalars; unused ones are
    simply ignored (keeps the fleet pytree homogeneous across legs).
    """

    def __init__(self, r_bs, l_0=0.0, damper: SimpleDamper = SimpleDamper(),
                 steering=None, braking=None, q_bs=None):
        self.r_bs = np.asarray(r_bs, dtype=float)
        self.q_bs = (np.array([1.0, 0, 0, 0]) if q_bs is None
                     else np.asarray(q_bs, dtype=float))
        self.l_0 = float(l_0)
        self.damper = damper
        self.steering = steering  # None | {"psi_max": rad}
        self.braking = braking    # None | {"eta_br": float}
        # friction constraint compensator gains (`landinggear.jl:401-409`)
        self.frc = C.pi_params(n=2, k_p=5.0, k_i=400.0, k_l=0.2,
                               bound_lo=-1.0, bound_hi=1.0)

    def init_x(self):
        return {"frc": jnp.zeros(2)}

    def init_u(self):
        return {"steering": jnp.asarray(0.0), "braking": jnp.asarray(0.0)}

    # ------------------------------------------------------------------ strut

    def strut_y(self, u, kin: KinData, trn: TerrainData) -> StrutY:
        """Full strut geometry (`landinggear.jl:228-328`), mask-selected
        against the wow=false defaults."""
        q_bs, r_bs_b, l_0 = jnp.asarray(self.q_bs), jnp.asarray(self.r_bs), self.l_0
        q_eb, q_nb, q_en = kin.q_eb, kin.q_nb, kin.q_en
        v_eb_b, omega_eb_b = kin.v_eb_b, kin.omega_eb_b

        # natural-length wheel endpoint vs terrain height -> wow
        # (`landinggear.jl:228-255`). The wheel-endpoint geodetic solution
        # is a first-order perturbation of the vehicle's (n_e, h_e), which
        # the kinematics already carry exactly:
        #   h_w0   = h_e + d_e . n_e        (n-vector = ellipsoid up)
        #   r_st_e = l_0 ks_e - delta_h n_e
        # instead of a second Fukushima Cartesian->geodetic solve + forward
        # transform per leg per stage. Errors over the ~3 m lever arm are
        # curvature-bounded: |d|^2/(2R) ~ 7e-7 m in h_w0 and ~3e-7 m in
        # r_st_e — far below the contact-dynamics scale (and the geoid
        # undulation N = h_e - h_o differs by ~3e-5 m across the wheelbase
        # on the 15-arcmin EGM96 grid). On the f32 fleet path this form is
        # strictly MORE accurate than the solve it replaces: it never
        # subtracts ~6.4e6 m ECEF coordinates to get a ~1 m result (0.5 m
        # f32 ulp noise), it works entirely in leg-scale quantities.
        # Exactness vs the two-transform form: tests/test_landinggear.py::
        # test_strut_perturbation_matches_exact_geodesy.
        q_es = qmul(q_eb, q_bs)
        ks_e = qrot(q_es, E3)
        r_bs_e = qrot(q_eb, r_bs_b)
        n_up_e = kin.n_e
        d_e = r_bs_e + l_0 * ks_e
        h_e_w0 = kin.h_e + _dot(d_e, n_up_e)
        h_e_trn = trn.elevation + (kin.h_e - kin.h_o)
        delta_h = h_e_w0 - h_e_trn
        wow = delta_h <= 0

        # strut-top -> terrain-point vector, in leg-scale quantities
        r_st_e = l_0 * ks_e - delta_h * n_up_e

        ut_n = trn.normal
        ut_e = qrot(q_en, ut_n)
        ut_ks = _dot(ut_e, ks_e)
        # guard: |ut_ks| ~ 0 only for a near-horizontal strut, masked by wow
        ut_ks_safe = jnp.where(jnp.abs(ut_ks) < 1e-6,
                               jnp.where(ut_ks < 0, -1e-6, 1e-6), ut_ks)
        l = _dot(ut_e, r_st_e) / ut_ks_safe
        alpha_ts = jnp.arccos(jnp.clip(ut_ks, -1.0, 1.0))

        xi = jnp.minimum(0.0, l - l_0)  # numerical-noise clamp (`:274`)

        r_sc_s = E3 * (l_0 + xi)
        r_sc_b = qrot(q_bs, r_sc_s)
        r_bc_b = r_sc_b + r_bs_b

        # contact point velocity from rigid-body motion
        v_ec_b_body = v_eb_b + jnp.cross(omega_eb_b, r_bc_b)
        v_ec_s_body = qrot_inv(q_bs, v_ec_b_body)
        psi_v = _safe_atan2(v_ec_s_body[1], v_ec_s_body[0])

        # steering (`:68-72`): engaged DirectSteering or castoring azimuth
        if self.steering is None:
            psi_sw = jnp.asarray(0.0)
        else:
            psi_sw = jnp.clip(u["steering"], -1.0, 1.0) * self.steering["psi_max"]

        q_sw = att.rot_z(psi_sw)
        q_ns = qmul(q_nb, q_bs)
        q_nw = qmul(q_ns, q_sw)

        # contact frame axes from wheel x projected on terrain plane (`:292-299`)
        kc_n = ut_n
        iw_n = qrot(q_nw, E1)
        iw_n_trn = iw_n - _dot(iw_n, kc_n) * kc_n
        ic_n = iw_n_trn / _safe_norm(iw_n_trn)
        jc_n = jnp.cross(kc_n, ic_n)
        R_nc = jnp.stack([ic_n, jc_n, kc_n], axis=-1)
        q_nc = att.matrix_to_quat(R_nc)
        q_sc = qmul(qconj(q_ns), q_nc)
        q_bc = qmul(q_bs, q_sc)

        # damper elongation rate cancels contact-normal velocity (`:309-315`)
        v_ec_c_body = qrot_inv(q_bc, v_ec_b_body)
        ks_c = qrot_inv(q_sc, E3)
        ks_c3 = jnp.where(jnp.abs(ks_c[2]) < 1e-6, 1e-6, ks_c[2])
        xi_dot = -v_ec_c_body[2] / ks_c3

        F_dmp_zs = damper_force(self.damper, xi, xi_dot)

        v_ec_c = v_ec_c_body + ks_c * xi_dot
        v_ec_xy = v_ec_c[:2]

        # mask everything but (delta_h, wow) with the wow=false defaults
        z, z3 = jnp.asarray(0.0), jnp.zeros(3)
        sel = lambda a, b: bwhere(wow, a, b)
        return StrutY(
            delta_h=delta_h, wow=wow,
            xi=sel(xi, z), xi_dot=sel(xi_dot, z),
            F_dmp_zs=sel(F_dmp_zs, z), psi_sw=sel(psi_sw, z),
            alpha_ts=sel(alpha_ts, z),
            r_sc_s=sel(r_sc_s, z3), q_sc=sel(q_sc, jnp.asarray([1.0, 0, 0, 0])),
            r_bc_b=sel(r_bc_b, z3), q_bc=sel(q_bc, jnp.asarray([1.0, 0, 0, 0])),
            v_ec_xy=sel(v_ec_xy, jnp.zeros(2)), trn=trn)

    # ---------------------------------------------------------------- contact

    def contact_y(self, x, u, strut: StrutY, frc_out: C.PIOutput) -> ContactY:
        """Contact force model (`landinggear.jl:411-476`)."""
        wow = strut.wow
        v_ec_xy = strut.v_ec_xy
        norm_v = _safe_norm(v_ec_xy)

        m_roll = mu_roll(norm_v)
        m_skid = mu_skid(strut.trn.surface, norm_v)

        if self.braking is None:
            kappa_br = jnp.asarray(0.0)
        else:
            kappa_br = jnp.clip(u["braking"], 0.0, 1.0) * self.braking["eta_br"]
        mu_x = m_roll + (m_skid - m_roll) * kappa_br

        # tire slip angle with near-zero-velocity chattering guard (`:436-440`)
        small_v = norm_v < 1e-3
        psi_cv = jnp.where(
            small_v, jnp.pi / 2,
            jnp.arctan2(jnp.where(small_v, 0.0, v_ec_xy[1]),
                        jnp.where(small_v, 1.0, v_ec_xy[0])))

        psi_skid = jnp.deg2rad(10.0)
        psi_abs = jnp.abs(psi_cv)
        mu_y = jnp.where(
            psi_abs < psi_skid, m_skid * psi_abs / psi_skid,
            jnp.where(psi_abs > jnp.pi - psi_skid,
                      m_skid * (1.0 - (psi_skid + psi_abs - jnp.pi) / psi_skid),
                      m_skid))

        mu_max = jnp.stack([mu_x, mu_y])
        mu_max = mu_max * jnp.minimum(1.0, m_skid / _safe_norm(mu_max))
        mu_eff = frc_out.output * mu_max

        f_c = jnp.stack([mu_eff[0], mu_eff[1], -jnp.ones_like(mu_eff[0])])
        f_s = qrot(strut.q_sc, f_c)
        f_s3 = jnp.where(jnp.abs(f_s[2]) < 1e-6, -1e-6, f_s[2])
        N = jnp.maximum(0.0, -strut.F_dmp_zs / f_s3)
        F_c = f_c * N

        wr_c = Wrench(F=F_c, tau=jnp.zeros(3))
        t_bc = FrameTransform(r=strut.r_bc_b, q=strut.q_bc)
        wr_b = translate_wrench(t_bc, wr_c)

        # wow=false defaults (`:421-423`)
        z = jnp.asarray(0.0)
        sel = lambda a, b: bwhere(wow, a, b)
        zero_wr = Wrench(F=jnp.zeros(3), tau=jnp.zeros(3))
        return ContactY(
            mu_roll=sel(m_roll, z), mu_skid=sel(m_skid, z),
            kappa_br=sel(kappa_br, z), psi_cv=sel(psi_cv, z),
            mu_max=sel(mu_max, jnp.zeros(2)), mu_eff=sel(mu_eff, jnp.zeros(2)),
            f_c=sel(f_c, jnp.zeros(3)), F_c=sel(F_c, jnp.zeros(3)),
            wr_b=Wrench(F=sel(wr_b.F, zero_wr.F), tau=sel(wr_b.tau, zero_wr.tau)),
            frc=frc_out)

    # ----------------------------------------------------------------- update

    def f_ode(self, x, u, s, t, kin: KinData, trn: TerrainData):
        strut = self.strut_y(u, kin, trn)
        # friction regulator input: -v_ec_xy (zero when airborne) (`:418`)
        frc_dot, frc_out = C.pi_ode(self.frc, x["frc"], -strut.v_ec_xy)
        contact = self.contact_y(x, u, strut, frc_out)
        crashed = jnp.logical_or(
            jnp.logical_and(strut.wow, strut.alpha_ts > ALPHA_TS_MAX),
            -strut.xi_dot > XI_DOT_MAX)
        y = GearUnitY(strut=strut, contact=contact, crashed=crashed)
        return {"frc": frc_dot}, y

    def f_step(self, x, u, s, t, kin: KinData, trn: TerrainData):
        """Reset the friction regulator state when airborne
        (`landinggear.jl:479-483`)."""
        strut = self.strut_y(u, kin, trn)
        frc = jnp.where(strut.wow, x["frc"], jnp.zeros(2))
        return {"frc": frc}, s


class GearSet:
    """A set of gear legs evaluated as ONE vmapped strut/contact computation
    (leg parameters stacked on a leading axis) — same math as N separate
    `LandingGearUnit`s, ~N-fold fewer ops in the compiled graph.

    All legs get a steering range and a braking efficiency; a leg without
    steering/braking simply has psi_max = 0 / eta_br = 0, which reproduces
    NoSteering/NoBraking exactly."""

    def __init__(self, names, r_bs, dampers, psi_max, eta_br):
        self.names = tuple(names)
        n = len(self.names)
        self.unit = LandingGearUnit(
            r_bs=np.zeros(3),
            damper=SimpleDamper(
                k_s=np.asarray([d.k_s for d in dampers]),
                k_d_ext=np.asarray([d.k_d_ext for d in dampers]),
                k_d_cmp=np.asarray([d.k_d_cmp for d in dampers]),
                F_max=np.asarray([d.F_max for d in dampers])),
            steering={"psi_max": np.asarray(psi_max)},
            braking={"eta_br": np.asarray(eta_br)})
        self.unit.r_bs = np.asarray(r_bs, dtype=float)  # (n, 3)
        self.unit.q_bs = np.broadcast_to(np.array([1.0, 0, 0, 0]), (n, 4)).copy()
        self.n = n

    def _vmapped(self, fn, *args):
        import jax
        unit = self.unit

        def leg(r_bs, q_bs, ks, kde, kdc, psi_max, eta_br, *rest):
            import copy
            u2 = copy.copy(unit)
            u2.r_bs = r_bs
            u2.q_bs = q_bs
            u2.damper = SimpleDamper(ks, kde, kdc, 50000.0)
            u2.steering = {"psi_max": psi_max}
            u2.braking = {"eta_br": eta_br}
            return fn(u2, *rest)

        d = unit.damper
        return jax.vmap(leg, in_axes=(0, 0, 0, 0, 0, 0, 0)
                        + (0,) * len(args[:1]) + (None,) * (len(args) - 1))(
            jnp.asarray(unit.r_bs), jnp.asarray(unit.q_bs),
            jnp.asarray(d.k_s), jnp.asarray(d.k_d_ext), jnp.asarray(d.k_d_cmp),
            jnp.asarray(unit.steering["psi_max"]),
            jnp.asarray(unit.braking["eta_br"]), *args)

    def f_ode(self, x, u, t, kin: KinData, trn: TerrainData):
        """x: {'frc': (n,2)}; u: {'steering': (n,), 'braking': (n,)}.
        Returns ({'frc': (n,2)}, GearUnitY with (n,)-leading leaves).

        Under an active `gear_gated` scope, dispatches through a scalar
        `lax.cond` — the airborne branch is exact for everything dynamics
        ever consumes (see `f_ode_airborne`)."""
        gate = _gear_gate.get()
        if gate is None:
            return self._f_ode_full(x, u, t, kin, trn)
        return jax.lax.cond(
            gate,
            # match_vma on BOTH branches: under shard_map the airborne
            # branch mints mesh-replicated constants (zeros, identity
            # quats) while the full branch's are varying — and vice versa
            # for pass-through leaves (terrain). Casting each branch's
            # replicated leaves to varying makes the cond types match.
            lambda op: match_vma(self._f_ode_full(*op), op),
            lambda op: match_vma(self.f_ode_airborne(*op), op),
            (x, u, t, kin, trn))

    def _f_ode_full(self, x, u, t, kin: KinData, trn: TerrainData):
        xd, y = self._vmapped(
            lambda unit, xu, kin, trn: unit.f_ode(
                {"frc": xu[:2]}, {"steering": xu[2], "braking": xu[3]},
                None, t, kin, trn),
            jnp.concatenate([x["frc"],
                             u["steering"][:, None], u["braking"][:, None]],
                            axis=1),
            kin, trn)
        return {"frc": xd["frc"]}, y

    def f_ode_airborne(self, x, u, t, kin: KinData, trn: TerrainData):
        """The wow=false evaluation, computed directly instead of by masking
        the full strut/contact math. Exactly reproduces `_f_ode_full` for
        every output that feeds back into the dynamics or discrete state
        when no leg has weight on wheel:

        - frc regulator: `pi_ode` with the same zero input the full path's
          `sel(v_ec_xy, 0)` mask produces — identical x_dot and PIOutput;
        - contact wrench: the full path masks it to exact 0.0;
        - crashed: False (wow false, xi_dot masked to 0);
        - every other StrutY/ContactY field: the same masked defaults.

        `delta_h` (wheel clearance) uses the same first-order
        local-frame form as the full path's `strut_y` (wheel-endpoint
        height perturbed off the vehicle's (n_e, h_e) along the ellipsoid
        normal), so the two cond branches agree on it exactly for the
        GearSet's l_0 = 0 legs."""
        n = self.n
        frc_dot, frc_out = C.pi_ode(self.unit.frc, x["frc"],
                                    jnp.zeros_like(x["frc"]))
        strut = self.strut_y_airborne(kin, trn)
        z = jnp.zeros(n, strut.delta_h.dtype)
        z2 = jnp.zeros((n, 2), z.dtype)
        z3 = jnp.zeros((n, 3), z.dtype)
        contact = ContactY(mu_roll=z, mu_skid=z, kappa_br=z, psi_cv=z,
                           mu_max=z2, mu_eff=z2, f_c=z3, F_c=z3,
                           wr_b=Wrench(F=z3, tau=z3), frc=frc_out)
        y = GearUnitY(strut=strut, contact=contact,
                      crashed=jnp.zeros(n, bool))
        return {"frc": frc_dot}, y

    def strut_y_airborne(self, kin: KinData, trn: TerrainData) -> StrutY:
        """Airborne StrutY: the wow=false masked defaults plus the
        cheap-local-frame `delta_h` (see `f_ode_airborne`)."""
        n = self.n
        down_e = -kin.n_e  # = qrot(q_en, E3): the ltf down column is -n_e
        r_bs_e = qrot(kin.q_eb, jnp.asarray(self.unit.r_bs, kin.h_e.dtype))
        h_w0 = kin.h_e - jnp.sum(r_bs_e * down_e, axis=-1)       # (n,)
        delta_h = h_w0 - (trn.elevation + (kin.h_e - kin.h_o))

        dt_ = delta_h.dtype
        z = jnp.zeros(n, dt_)
        z2, z3 = jnp.zeros((n, 2), dt_), jnp.zeros((n, 3), dt_)
        qid = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0], dt_), (n, 4))
        bc = lambda leaf: jnp.broadcast_to(jnp.asarray(leaf),
                                           (n,) + jnp.shape(leaf))
        return StrutY(delta_h=delta_h, wow=jnp.zeros(n, bool),
                      xi=z, xi_dot=z, F_dmp_zs=z, psi_sw=z, alpha_ts=z,
                      r_sc_s=z3, q_sc=qid, r_bc_b=z3, q_bc=qid,
                      v_ec_xy=z2, trn=jax.tree.map(bc, trn))

    def f_step(self, x, u, t, kin: KinData, trn: TerrainData):
        gate = _gear_gate.get()
        if gate is None:
            return self._f_step_full(x, u, t, kin, trn)
        return jax.lax.cond(
            gate,
            lambda op: match_vma(self._f_step_full(*op), op),
            # airborne: the full path computes `where(wow, frc, 0)` = 0
            lambda op: match_vma({"frc": jnp.zeros_like(op[0]["frc"])}, op),
            (x, u, t, kin, trn))

    def _f_step_full(self, x, u, t, kin: KinData, trn: TerrainData):
        xs, _ = self._vmapped(
            lambda unit, xu, kin, trn: unit.f_step(
                {"frc": xu[:2]}, {"steering": xu[2], "braking": xu[3]},
                None, t, kin, trn),
            jnp.concatenate([x["frc"],
                             u["steering"][:, None], u["braking"][:, None]],
                            axis=1),
            kin, trn)
        return {"frc": xs["frc"]}

    def strut_y(self, x, u, t, kin: KinData, trn: TerrainData) -> StrutY:
        gate = _gear_gate.get()
        if gate is None:
            return self._strut_y_full(x, u, t, kin, trn)
        return jax.lax.cond(
            gate,
            lambda op: match_vma(self._strut_y_full(*op), op),
            lambda op: match_vma(self.strut_y_airborne(op[3], op[4]), op),
            (x, u, t, kin, trn))

    def _strut_y_full(self, x, u, t, kin: KinData, trn: TerrainData):
        return self._vmapped(
            lambda unit, xu, kin, trn: unit.strut_y(
                {"steering": xu[2], "braking": xu[3]}, kin, trn),
            jnp.concatenate([x["frc"],
                             u["steering"][:, None], u["braking"][:, None]],
                            axis=1),
            kin, trn)

    def leg_unit(self, i):
        """Concrete `LandingGearUnit` for leg `i` with static (numpy)
        parameters — the per-leg path used by the fine Pallas cluster
        split, where the 3-leg kernel exceeds the Mosaic compiler's
        memory cap. Same hard F_max as `_vmapped` so both paths are
        bit-identical."""
        import copy
        d = self.unit.damper
        u2 = copy.copy(self.unit)
        u2.r_bs = np.asarray(self.unit.r_bs)[i]
        u2.q_bs = np.asarray(self.unit.q_bs)[i]
        u2.damper = SimpleDamper(float(np.asarray(d.k_s)[i]),
                                 float(np.asarray(d.k_d_ext)[i]),
                                 float(np.asarray(d.k_d_cmp)[i]), 50000.0)
        u2.steering = {"psi_max":
                       float(np.asarray(self.unit.steering["psi_max"])[i])}
        u2.braking = {"eta_br":
                      float(np.asarray(self.unit.braking["eta_br"])[i])}
        return u2

    def f_ode_leg(self, i, x_frc, steering, braking, t,
                  kin: KinData, trn: TerrainData):
        """One leg's continuous update: (frc_dot (2,), contact wrench)."""
        unit = self.leg_unit(i)
        xd, y = unit.f_ode({"frc": x_frc},
                           {"steering": steering, "braking": braking},
                           None, t, kin, trn)
        return xd["frc"], y.contact.wr_b

    def strut_y_leg(self, i, steering, braking,
                    kin: KinData, trn: TerrainData) -> StrutY:
        """One leg's strut geometry (WoW test, angles, elongation rate) —
        the per-leg path used by the fine finish-kernel split."""
        unit = self.leg_unit(i)
        return unit.strut_y({"steering": steering, "braking": braking},
                            kin, trn)

    def init_x(self):
        return {"frc": jnp.zeros((self.n, 2))}
