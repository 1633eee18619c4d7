"""TimeSeries plotting: recursive `make_plots` / `save_plots`.

Mirrors the reference's Plots.jl extension (`FlightCorePlotsExt.jl:34-130`):
`make_plots` walks a logged output pytree into a nested dict of matplotlib
figures (scalar leaves -> line plot; vector leaves -> stacked subplots);
`save_plots` writes the dict tree into folders of PNGs.
"""

import os

import numpy as np


def _is_leaf_array(y):
    return hasattr(y, "ndim")


def make_plots(ts, title=""):
    """TimeSeries -> nested dict of figures. `ts` is a
    `flightjax.core.sim.TimeSeries` (t (n,), y pytree with leading dim n)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.asarray(ts.t)
    y = ts.y

    if _is_leaf_array(y):
        y = np.asarray(y)
        if y.ndim == 1:  # scalar signal
            fig, ax = plt.subplots(figsize=(8, 3))
            ax.plot(t, y)
            ax.set_xlabel("t (s)")
            ax.set_title(title)
            ax.grid(True, alpha=0.3)
            fig.tight_layout()
            return fig
        n = y.shape[-1] if y.ndim == 2 else int(np.prod(y.shape[1:]))
        yf = y.reshape(len(t), n)
        fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), sharex=True)
        axes = np.atleast_1d(axes)
        for i, ax in enumerate(axes):
            ax.plot(t, yf[:, i])
            ax.set_ylabel(f"[{i}]")
            ax.grid(True, alpha=0.3)
        axes[-1].set_xlabel("t (s)")
        axes[0].set_title(title)
        fig.tight_layout()
        return fig

    # pytree node: recurse
    if hasattr(y, "_asdict"):
        items = y._asdict().items()
    elif isinstance(y, dict):
        items = y.items()
    else:
        return None
    out = {}
    for name, sub in items:
        from flightjax.core.sim import TimeSeries
        fig = make_plots(TimeSeries(ts.t, sub), title=str(name))
        if fig is not None:
            out[str(name)] = fig
    return out


def save_plots(plots, folder):
    """Walk the nested dict of figures into folders of PNGs
    (`FlightCorePlotsExt.jl:106-130`)."""
    import matplotlib.pyplot as plt

    os.makedirs(folder, exist_ok=True)
    if isinstance(plots, dict):
        for name, sub in plots.items():
            if isinstance(sub, dict):
                save_plots(sub, os.path.join(folder, name))
            elif sub is not None:
                sub.savefig(os.path.join(folder, f"{name}.png"), dpi=100)
                plt.close(sub)
    elif plots is not None:
        plots.savefig(os.path.join(folder, "plot.png"), dpi=100)
        plt.close(plots)


# --------------------------------------------------- specialized plot sets

def _fig(nrows=1, ncols=1, h=2.6):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt.subplots(nrows, ncols, figsize=(9, h * nrows), squeeze=False)


def _stack(ax_col, t, y, labels, ylabel=""):
    for ax, col, lbl in zip(ax_col, np.asarray(y).T, labels):
        ax.plot(t, col)
        ax.set_ylabel(lbl)
        ax.grid(True, alpha=0.3)
    ax_col[-1].set_xlabel("t (s)")


def kin_plots(ts):
    """KinData plot set (`FlightPhysicsPlotsExt.jl:178-258`): Euler angles,
    angular rates, NED/body velocities, geographic track, altitude,
    v/chi/gamma, and the 3-D trajectory. `ts` is a TimeSeries over a
    KinData subtree. Returns a dict of figures."""
    t = np.asarray(ts.t)
    kin = ts.y
    r2d = np.degrees
    out = {}

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, r2d(np.asarray(kin.e_nb)),
           ["psi (deg)", "theta (deg)", "phi (deg)"])
    ax[0, 0].set_title("Euler angles (ZYX, body wrt NED)")
    out["e_nb"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, r2d(np.asarray(kin.omega_wb_b)),
           ["p (deg/s)", "q (deg/s)", "r (deg/s)"])
    ax[0, 0].set_title("Angular rates (body wrt local-level)")
    out["omega_wb_b"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, np.asarray(kin.v_eb_n),
           ["v_N (m/s)", "v_E (m/s)", "v_D (m/s)"])
    ax[0, 0].set_title("NED velocity")
    out["v_eb_n"] = fig

    fig, ax = _fig(1, h=4.0)
    lat, lon = r2d(np.asarray(kin.lat)), r2d(np.asarray(kin.lon))
    ax[0, 0].plot(lon, lat)
    ax[0, 0].set_xlabel("lon (deg)")
    ax[0, 0].set_ylabel("lat (deg)")
    ax[0, 0].set_title("Geographic track")
    ax[0, 0].grid(True, alpha=0.3)
    out["track"] = fig

    fig, ax = _fig(2)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(kin.h_e), np.asarray(kin.h_o)], axis=-1),
           ["h_ellip (m)", "h_orth (m)"])
    ax[0, 0].set_title("Altitude")
    out["altitude"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(kin.v_gnd), r2d(np.asarray(kin.chi_gnd)),
                     r2d(np.asarray(kin.gamma_gnd))], axis=-1),
           ["v_gnd (m/s)", "chi (deg)", "gamma (deg)"])
    ax[0, 0].set_title("Ground speed / course / flight-path angle")
    out["ground"] = fig

    # 3-D trajectory (`:Ob_t3d`): local ENU meters from the first sample
    import matplotlib.pyplot as plt
    R = 6.371e6
    lat_r, lon_r = np.radians(lat), np.radians(lon)
    e = (lon_r - lon_r[0]) * R * np.cos(lat_r[0])
    n = (lat_r - lat_r[0]) * R
    up = np.asarray(kin.h_e) - np.asarray(kin.h_e)[0]
    fig = plt.figure(figsize=(8, 7))
    ax3 = fig.add_subplot(projection="3d")
    ax3.plot(e, n, up)
    ax3.set_xlabel("east (m)")
    ax3.set_ylabel("north (m)")
    ax3.set_zlabel("up (m)")
    ax3.set_title("3-D trajectory")
    out["Ob_t3d"] = fig
    return out


def air_plots(ts):
    """AirData plot set (`FlightPhysicsPlotsExt.jl:365-445`)."""
    t = np.asarray(ts.t)
    air = ts.y
    out = {}
    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(air.TAS), np.asarray(air.EAS),
                     np.asarray(air.CAS)], axis=-1),
           ["TAS (m/s)", "EAS (m/s)", "CAS (m/s)"])
    ax[0, 0].set_title("Airspeeds")
    out["speeds"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(air.M), np.asarray(air.q),
                     np.asarray(air.rho)], axis=-1),
           ["Mach", "q (Pa)", "rho (kg/m^3)"])
    ax[0, 0].set_title("Mach / dynamic pressure / density")
    out["mach_q_rho"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, np.asarray(air.v_wb_b),
           ["u_a (m/s)", "v_a (m/s)", "w_a (m/s)"])
    ax[0, 0].set_title("Aerodynamic velocity, body axes")
    out["v_wb_b"] = fig
    return out


def engine_plots(ts):
    """PistonEngine plot set (`FlightPhysicsPlotsExt.jl:700-780`): MAP,
    shaft speed, torque/power, SFC/fuel flow, discrete state. `ts.y` is a
    TimeSeries over a `PistonEngineY` subtree."""
    t = np.asarray(ts.t)
    eng = ts.y
    out = {}

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(eng.throttle), np.asarray(eng.MAP) / 1e3,
                     np.asarray(eng.mixture_pos)], axis=-1),
           ["throttle", "MAP (kPa)", "mixture"])
    ax[0, 0].set_title("Engine command / manifold")
    out["manifold"] = fig

    fig, ax = _fig(3)
    rpm = np.asarray(eng.omega) * 60.0 / (2.0 * np.pi)
    _stack(ax[:, 0], t,
           np.stack([rpm, np.asarray(eng.tau_shaft),
                     np.asarray(eng.P_shaft) / 1e3], axis=-1),
           ["RPM", "tau_shaft (N m)", "P_shaft (kW)"])
    ax[0, 0].set_title("Shaft speed / torque / power")
    out["shaft"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(eng.SFC) * 1e6, np.asarray(eng.mdot) * 1e3,
                     np.asarray(eng.f)], axis=-1),
           ["SFC (mg/J)", "mdot (g/s)", "fuel/air ratio"])
    ax[0, 0].set_title("Fuel consumption")
    out["fuel"] = fig

    fig, ax = _fig(1)
    ax[0, 0].step(t, np.asarray(eng.state), where="post")
    ax[0, 0].set_yticks([0, 1, 2], ["off", "starting", "running"])
    ax[0, 0].set_xlabel("t (s)")
    ax[0, 0].set_title("Engine state machine")
    ax[0, 0].grid(True, alpha=0.3)
    out["state"] = fig
    return out


def prop_plots(ts):
    """Propeller plot set (`FlightPhysicsPlotsExt.jl:640-698`): advance
    ratio / tip Mach / blade pitch, thrust & torque, power & efficiency.
    `ts.y` is a TimeSeries over a `PropellerY` subtree."""
    t = np.asarray(ts.t)
    prp = ts.y
    out = {}

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(prp.J), np.asarray(prp.Mt),
                     np.degrees(np.asarray(prp.dbeta))], axis=-1),
           ["J", "tip Mach", "dbeta (deg)"])
    ax[0, 0].set_title("Operating point")
    out["operating"] = fig

    F = np.asarray(prp.wr_p.F)
    M = np.asarray(prp.wr_p.tau)
    fig, ax = _fig(2)
    _stack(ax[:, 0], t, np.stack([F[:, 0], M[:, 0]], axis=-1),
           ["thrust F_x (N)", "torque M_x (N m)"])
    ax[0, 0].set_title("Thrust / torque (propeller axes)")
    out["wrench"] = fig

    fig, ax = _fig(2)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(prp.P) / 1e3, np.asarray(prp.eta_p)],
                    axis=-1),
           ["P (kW)", "eta_p"])
    ax[0, 0].set_title("Power / propulsive efficiency")
    out["power"] = fig
    return out


def ldg_plots(ts):
    """Landing-gear-unit plot set (`FlightPhysicsPlotsExt.jl:782-898`):
    strut elongation/rate/damper force/WoW and contact friction state.
    `ts.y` is a TimeSeries over a `GearUnitY` subtree."""
    t = np.asarray(ts.t)
    gear = ts.y
    out = {}

    fig, ax = _fig(4)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(gear.strut.xi), np.asarray(gear.strut.xi_dot),
                     np.asarray(gear.strut.F_dmp_zs) / 1e3,
                     np.asarray(gear.strut.wow)], axis=-1),
           ["xi (m)", "xi_dot (m/s)", "F_dmp (kN)", "WoW"])
    ax[0, 0].set_title("Strut")
    out["strut"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t,
           np.stack([np.asarray(gear.contact.mu_max)[..., 0],
                     np.asarray(gear.contact.mu_eff)[..., 0],
                     np.asarray(gear.contact.kappa_br)], axis=-1),
           ["mu_max (x)", "mu_eff (x)", "kappa_br"])
    ax[0, 0].set_title("Contact friction")
    out["friction"] = fig

    Fc = np.asarray(gear.contact.F_c)
    fig, ax = _fig(3)
    _stack(ax[:, 0], t, Fc / 1e3,
           ["F_cx (kN)", "F_cy (kN)", "F_cz (kN)"])
    ax[0, 0].set_title("Contact-frame force")
    out["F_c"] = fig
    return out


def pid_plots(ts, dt=None):
    """PID/PI internals plot set (`FlightPhysicsPlotsExt.jl:461-540`):
    proportional/integral(/derivative) paths, free vs clamped output,
    saturation + integrator-halt flags. Accepts a TimeSeries over a
    `PIOutput` or `PIDOutput` subtree."""
    t = np.asarray(ts.t)
    c = ts.y
    out = {}

    def flat(v):  # vector controllers (PIVector{N}) -> all N channels
        return np.asarray(v).reshape(len(t), -1)

    def rows(names_vals, title):
        fig, ax = _fig(len(names_vals))
        for a, (lbl, v) in zip(ax[:, 0], names_vals):
            a.plot(t, flat(v))
            a.set_ylabel(lbl)
            a.grid(True, alpha=0.3)
        ax[-1, 0].set_xlabel("t (s)")
        ax[0, 0].set_title(title)
        return fig

    paths = [("y_p", c.y_p), ("y_i", c.y_i)]
    if hasattr(c, "y_d"):
        paths.append(("y_d", c.y_d))
    out["paths"] = rows(paths, "Controller paths")
    out["output"] = rows([("out_free", c.out_free), ("output", c.output)],
                         "Free vs clamped output")
    out["saturation"] = rows(
        [("sat_out", c.sat_out), ("int_halted", c.int_halted)],
        "Saturation / integrator halt")
    return out


def dyn_plots(ts):
    """DynamicsData plot set (`FlightPhysicsPlotsExt.jl:296-362`)."""
    t = np.asarray(ts.t)
    dyn = ts.y
    out = {}
    fig, ax = _fig(3)
    _stack(ax[:, 0], t, np.asarray(dyn.f_c_c),
           ["f_x (m/s^2)", "f_y (m/s^2)", "f_z (m/s^2)"])
    ax[0, 0].set_title("Specific force at CoM")
    out["f_c_c"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, np.asarray(dyn.a_ec_c),
           ["a_x (m/s^2)", "a_y (m/s^2)", "a_z (m/s^2)"])
    ax[0, 0].set_title("ECEF acceleration at CoM")
    out["a_ec_c"] = fig

    fig, ax = _fig(3)
    _stack(ax[:, 0], t, np.asarray(dyn.wr_sum_b.F),
           ["F_x (N)", "F_y (N)", "F_z (N)"])
    ax[0, 0].set_title("Total external force, body axes")
    out["F_ext"] = fig
    return out
