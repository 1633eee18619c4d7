"""Dryden continuous-gust turbulence (MIL-F-8785C).

Beyond-reference capability: Flight.jl's wind models are uniform NED
vectors only (`atmosphere.jl:151-181`); stochastic gusting — required for
any certification-style Monte Carlo study — has no counterpart there.
This module implements the standard Dryden spectral model in the
MIL-F-8785C convention as a `Component` whose five filter states ride in
the vehicle's continuous state and integrate under the same RK4 as the
airframe, with the band-limited white-noise drive held constant across
each step (zero-order hold, redrawn in `f_step` from a counter-based
PRNG stream so every fleet lane gets an independent, reproducible
realization from its `seed` input).

Spectra (one-sided, MIL-F-8785C §3.7.2.1; integral over omega in [0, inf)
equals the variance):

    Phi_u(w) = sigma_u^2 (2 L_u / (pi V)) / (1 + (L_u w / V)^2)
    Phi_v(w) = sigma_v^2 (L_v / (pi V)) (1 + 3 (L_v w / V)^2)
                                        / (1 + (L_v w / V)^2)^2
    Phi_w    = Phi_v with (L_w, sigma_w)

realized as shaping filters driven by white noise of two-sided PSD pi
(discrete hold: eta_k ~ N(0, pi / dt)), which makes the stationary output
variance exactly sigma^2 per axis — verified statistically in
`tests/test_turbulence.py`.

Scale lengths / intensities (low-altitude model, h_AGL < 1000 ft, spec
formulas in feet):

    L_w = h,  L_u = L_v = h / (0.177 + 0.000823 h)^1.2
    sigma_w = 0.1 W20,  sigma_u = sigma_v = sigma_w / (0.177 + 0.000823 h)^0.4

with W20 the mean wind speed at 20 ft (the single severity knob: ~7.7 m/s
light, ~15.4 moderate, ~23.2 severe). Above 2000 ft the 8785C
medium/high-altitude scales apply (L = 1750 ft isotropic; sigma held at
0.1 W20 for continuity instead of the spec's exceedance charts —
documented simplification); 1000-2000 ft blends linearly. Gusts are
generated along body axes (spec convention) and rotated into NED by the
vehicle before entering `AirData`.
"""

import math

import jax
import jax.numpy as jnp

from flightjax.core.modeling import Component

FT = 0.3048  # m per ft

# below V_MIN m/s relative airspeed the Dryden coefficients are evaluated
# at V_MIN: the model is meaningless at taxi speeds and K_v ~ 1/sqrt(V)
# otherwise blows up the output gain as V -> 0
V_MIN = 5.0
H_AGL_MIN_FT = 10.0
H_LOW_FT = 1000.0
H_HIGH_FT = 2000.0
L_HIGH_FT = 1750.0


def scales(h_agl, W20):
    """(L_u, L_v, L_w, sigma_u, sigma_v, sigma_w) in SI units at height
    above ground h_agl [m] and 20-ft wind speed W20 [m/s] (airspeed enters
    only through the filter time constants T = L/V, not the scales). Pure
    function of slowly varying flight condition; evaluated fresh at every
    RK4 stage (cheap elementwise arithmetic)."""
    h_ft = jnp.clip(h_agl / FT, H_AGL_MIN_FT, None)
    h_low = jnp.clip(h_ft, H_AGL_MIN_FT, H_LOW_FT)
    den = 0.177 + 0.000823 * h_low
    L_w_lo = h_low
    L_uv_lo = h_low / den**1.2
    sig_w = 0.1 * W20
    sig_uv_lo = sig_w / den**0.4

    blend = jnp.clip((h_ft - H_LOW_FT) / (H_HIGH_FT - H_LOW_FT), 0.0, 1.0)
    L_u = ((1 - blend) * L_uv_lo + blend * L_HIGH_FT) * FT
    L_v = L_u
    L_w = ((1 - blend) * L_w_lo + blend * L_HIGH_FT) * FT
    sig_u = (1 - blend) * sig_uv_lo + blend * sig_w
    return L_u, L_v, L_w, sig_u, sig_u, sig_w


def shear_scale(u, h_agl):
    """MIL-F-8785C 3.7.3.1 mean-wind boundary-layer shear: the magnitude
    of the horizontal mean wind follows a logarithmic profile

        |W(h)| = W20 ln(h / z0) / ln(20 ft / z0)

    referenced to the wind at 20 ft AGL. Returns the dimensionless
    multiplier for the horizontal components of the input mean wind
    (which is interpreted as the 20-ft wind when shear is enabled).
    z0 = 0.15 ft for flight phase Category C (approach/landing), 2.0 ft
    otherwise; `shear_z0_ft` <= 0 (the init default) disables shear
    (multiplier 1 everywhere). The profile is clamped below h = z0 (wind
    -> 0 at the roughness length, never negative) and the spec gives it
    meaning up to ~1000 ft; above, the log growth is mild and harmless."""
    z0 = u["shear_z0_ft"]
    # unconditional positive floor: with shear off (z0 <= 0) and the
    # vehicle on the ground h_agl can be exactly 0 (or negative under gear
    # compression) — log(0) in the untaken where-branch would poison
    # reverse-mode gradients (0 * inf cotangents) through diffsim/linearize
    h_ft = jnp.maximum(h_agl / FT, jnp.maximum(z0 * (1.0 + 1e-6), 1e-3))
    on = z0 > 0.0
    safe_z0 = jnp.where(on, z0, 1.0)
    k = jnp.log(h_ft / safe_z0) / jnp.log(20.0 / safe_z0)
    return jnp.where(on, jnp.maximum(k, 0.0), 1.0)


def discrete_gust(u, t):
    """Body-axes "1-cosine" discrete gust (CS 25.341(a) / MIL-F-8785C
    3.7.3.2 shape), time-parameterized: a full smooth pulse
    amp/2 (1 - cos(pi (t - t0)/T)) over t in [t0, t0 + 2T], zero outside.
    (The certification form parameterizes by penetration distance s = V t;
    at the trimmed airspeed the two are equivalent with T = H/V.)"""
    tau = (jnp.asarray(t) - u["gust_t0"]) / u["gust_T"]
    env = jnp.where((tau >= 0.0) & (tau <= 2.0),
                    0.5 * (1.0 - jnp.cos(jnp.pi * tau)), 0.0)
    return u["gust_amp"] * env[..., None]


class DrydenTurbulence(Component):
    """Five-state Dryden gust filter bank.

    x = {"ug": (), "vg": (2,), "wg": (2,)} — first-order u filter +
    controllable-canonical second-order v/w filters; u = {"seed": int32
    per-lane stream id, "W20": severity [m/s]} (W20 = 0 switches the model
    off exactly: zero gain, decaying states); s = {"eta": (3,) raw N(0,1)
    drive held over the step, "n": int32 step counter}.

    `dt` must equal the Simulation's continuous step (the noise hold
    interval sets the drive PSD: eta * sqrt(pi / dt))."""

    def __init__(self, dt):
        self.dt = float(dt)

    def init_x(self):
        return {"ug": jnp.asarray(0.0), "vg": jnp.zeros(2),
                "wg": jnp.zeros(2)}

    def init_u(self):
        # gust_*: deterministic "1-cosine" discrete gust (CS 25.341(a) /
        # MIL-F-8785C 3.7.3.2 shape): v(t) = amp/2 (1 - cos(pi (t-t0)/T))
        # for t0 <= t <= t0 + 2T (a full smooth pulse of duration 2T),
        # zero outside. amp is a body-axes vector so one input covers
        # vertical (w), lateral (v) and head-on (u) certification gusts;
        # t0 defaults far in the future = off. Stateless (pure function
        # of t), so it adds no filter states and composes with the Dryden
        # field by superposition.
        # shear_z0_ft: surface roughness length [ft] for the logarithmic
        # mean-wind shear profile (`shear_scale`); 0.15 ft = Category C
        # (approach/landing), 2.0 ft otherwise, <= 0 = off (default).
        return {"seed": jnp.asarray(0, jnp.int32), "W20": jnp.asarray(0.0),
                "gust_amp": jnp.zeros(3), "gust_t0": jnp.asarray(1e30),
                "gust_T": jnp.asarray(1.0), "shear_z0_ft": jnp.asarray(0.0)}

    def init_s(self):
        return {"eta": jnp.zeros(3), "n": jnp.asarray(0, jnp.int32)}

    # ------------------------------------------------------------- dynamics

    def f_ode(self, x, u, s, t, V, h_agl):
        """Filter derivatives + body-axes gust vector (..., 3)."""
        V = jnp.clip(V, V_MIN, None)
        L_u, L_v, L_w, sig_u, sig_v, sig_w = scales(h_agl, u["W20"])
        eta = s["eta"] * math.sqrt(math.pi / self.dt)

        T_u = L_u / V
        ug_dot = (eta[..., 0] - x["ug"]) / T_u

        def second_order(xv, T, eta_i):
            x1, x2 = xv[..., 0], xv[..., 1]
            x2_dot = (eta_i - x1 - 2.0 * T * x2) / (T * T)
            return jnp.stack([x2, x2_dot], axis=-1)

        T_v, T_w = L_v / V, L_w / V
        vg_dot = second_order(x["vg"], T_v, eta[..., 1])
        wg_dot = second_order(x["wg"], T_w, eta[..., 2])

        x_dot = {"ug": ug_dot, "vg": vg_dot, "wg": wg_dot}
        g = (self._gust(x, T_u, T_v, T_w, sig_u, sig_v, sig_w)
             + discrete_gust(u, t))
        return x_dot, g

    def gust(self, x, u, V, h_agl, t=0.0):
        """Body-axes gust from the current states only (for consumers that
        need the output without the derivative, e.g. `f_step` air data)."""
        V = jnp.clip(V, V_MIN, None)
        L_u, L_v, L_w, sig_u, sig_v, sig_w = scales(h_agl, u["W20"])
        return (self._gust(x, L_u / V, L_v / V, L_w / V, sig_u, sig_v, sig_w)
                + discrete_gust(u, t))

    @staticmethod
    def _gust(x, T_u, T_v, T_w, sig_u, sig_v, sig_w):
        sqrt2pi = math.sqrt(2.0 / math.pi)
        sqrt1pi = math.sqrt(1.0 / math.pi)
        sqrt3 = math.sqrt(3.0)
        # K_u = sig_u sqrt(2 T_u / pi); y_u = K_u x_ug
        gu = sig_u * sqrt2pi * jnp.sqrt(T_u) * x["ug"]
        gv = (sig_v * sqrt1pi * jnp.sqrt(T_v)
              * (x["vg"][..., 0] + sqrt3 * T_v * x["vg"][..., 1]))
        gw = (sig_w * sqrt1pi * jnp.sqrt(T_w)
              * (x["wg"][..., 0] + sqrt3 * T_w * x["wg"][..., 1]))
        return jnp.stack([gu, gv, gw], axis=-1)

    # ------------------------------------------------------------- discrete

    def f_step(self, x, u, s, t, *ctx):
        """Redraw the held white-noise drive for the next step from a
        counter-based stream: key = fold_in(fold_in(base, seed), n). Pure
        function of (seed, n) — reproducible, lane-independent, and
        resume-safe (the counter rides in s)."""
        n = s["n"] + 1
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0x0D27), u["seed"]), n)
        eta = jax.random.normal(key, (3,), dtype=jnp.result_type(s["eta"]))
        return x, {"eta": eta, "n": n}
