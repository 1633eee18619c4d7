"""Robot2D: 2D self-balancing two-body robot with LQR/PID cascade control.

Mirrors `/root/reference/lib/FlightApps/src/robot2d/robot2d.jl`:
- `Vehicle` nonlinear dynamics via 2x2 mass-matrix solve (`robot2d.jl:50-92`)
- steady-state initialization (`:208-228`)
- state-space extraction + exact linearization (`:233-333`)
- `Controller` = v2m LQR (velocity) + eta2v PID (position) cascade with
  direct/velocity/position mode machine (`:341-449`)
- `Robot` wiring controller output to motor input each periodic update
  (`:544-551`), with `LostBalance` termination at |theta| > 45 deg
  (`:531-560`) — here a sticky mask in the discrete state that freezes the
  lane (vmap-friendly), not an exception.

The LQR gains are synthesized at construction from the exact linearization
(the reference designs offline into `robot2d.h5` with the same weights —
`design/robot2d/robot2d_design.jl:41-53`).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component, tree_where
from flightjax.physics import control as C
from flightjax.physics.linearization import linearize

G_STD = 9.80665

MODE_DIRECT = 0
MODE_VELOCITY = 1
MODE_POSITION = 2

THETA_MAX = np.deg2rad(45.0)


class VehicleY(NamedTuple):
    omega: jnp.ndarray   # main body angular velocity (rad/s)
    v: jnp.ndarray       # horizontal velocity of origin (m/s)
    theta: jnp.ndarray   # main body tilt from vertical (rad)
    eta: jnp.ndarray     # horizontal position (m)
    u_m: jnp.ndarray     # normalized motor command
    tau_m: jnp.ndarray   # motor torque (N*m)
    omega_dot: jnp.ndarray
    v_dot: jnp.ndarray


class Vehicle(Component):
    """Two-body balancing vehicle (`robot2d.jl:20-92`)."""

    def __init__(self, L=0.15, R=0.05, m_b=1.0, m_r=0.1, J_b=None, J_r=None,
                 k_m=0.32, b_m=0.0189, J_m=0.0014):
        self.L = L
        self.R = R
        self.m_b = m_b
        self.m_r = m_r
        self.J_b = J_b if J_b is not None else m_b * (2 * L) ** 2 / 12
        self.J_r = J_r if J_r is not None else 0.5 * m_r * R**2
        self.k_m = k_m
        self.b_m = b_m
        self.J_m = J_m

    def init_x(self, u_m=0.0, omega=0.0, eta=0.0):
        """Steady-state init: vertical, rolling at the motor's steady speed
        (`robot2d.jl:214-228`)."""
        v = (omega + self.k_m * u_m / self.b_m) * self.R
        return {"omega": jnp.asarray(float(omega)), "v": jnp.asarray(v),
                "theta": jnp.asarray(0.0), "eta": jnp.asarray(float(eta))}

    def init_u(self, u_m=0.0):
        return {"m": jnp.asarray(float(u_m))}

    def f_ode(self, x, u, s, t):
        L, R, m_b, m_r = self.L, self.R, self.m_b, self.m_r
        J_b, J_r, k_m, b_m, J_m = self.J_b, self.J_r, self.k_m, self.b_m, self.J_m
        omega, v, theta, eta = x["omega"], x["v"], x["theta"], x["eta"]

        u_m = jnp.clip(u["m"], -1.0, 1.0)
        omega_m = v / R - omega
        tau_ss = k_m * u_m - b_m * omega_m

        st = jnp.sin(theta)
        ct = jnp.cos(theta)

        M11 = m_b * L**2 + J_b + J_m
        M22 = m_b + m_r + (J_r + J_m) / R**2
        M12 = m_b * L * ct - J_m / R
        det = M11 * M22 - M12 * M12

        b1 = -tau_ss + m_b * L * G_STD * st
        b2 = tau_ss / R + m_b * L * omega**2 * st
        omega_dot = (M22 * b1 - M12 * b2) / det
        v_dot = (M11 * b2 - M12 * b1) / det
        omega_m_dot = v_dot / R - omega_dot
        tau_m = tau_ss - J_m * omega_m_dot

        x_dot = {"omega": omega_dot, "v": v_dot, "theta": omega, "eta": v}
        y = VehicleY(omega=omega, v=v, theta=theta, eta=eta, u_m=u_m,
                     tau_m=tau_m, omega_dot=omega_dot, v_dot=v_dot)
        return x_dot, y

    # ------------------------------------------------------- linearization

    X_LABELS = ("omega", "v", "theta", "eta")
    U_LABELS = ("m",)
    Y_LABELS = ("omega", "v", "theta", "eta", "u_m", "tau_m")

    def linearize(self, u_m=0.0, omega=0.0, eta=0.0):
        x0 = self.init_x(u_m=u_m, omega=omega, eta=eta)
        x0_flat = jnp.asarray([x0[k] for k in self.X_LABELS])
        u0_flat = jnp.asarray([u_m])

        def unpack(xf, uf):
            x = dict(zip(self.X_LABELS, xf))
            return x, {"m": uf[0]}

        def f(xf, uf):
            x, u = unpack(xf, uf)
            xd, _ = self.f_ode(x, u, None, 0.0)
            return jnp.stack([xd[k] for k in self.X_LABELS])

        def h(xf, uf):
            x, u = unpack(xf, uf)
            _, y = self.f_ode(x, u, None, 0.0)
            return jnp.stack([getattr(y, k) for k in self.Y_LABELS])

        return linearize(f, h, x0_flat, u0_flat, self.X_LABELS, self.U_LABELS,
                         self.Y_LABELS)


class ControllerY(NamedTuple):
    mode: jnp.ndarray
    m_ref: jnp.ndarray
    v_ref: jnp.ndarray
    eta_ref: jnp.ndarray
    m_cmd: jnp.ndarray
    v2m: C.LQROutput
    eta2v: C.PIDOutput


class Controller(Component):
    """Velocity LQR + position PID cascade (`robot2d.jl:349-449`). Gains are
    designed from the vehicle linearization at construction with the
    reference's weights (`robot2d_design.jl:41-53`)."""

    def __init__(self, vehicle: Vehicle):
        from flightjax.utils.design import design_lqr_tracker

        self.vehicle = vehicle
        lss = vehicle.linearize().delete_vars(x=("eta",), y=("eta",))
        self.v2m = design_lqr_tracker(
            lss, z_labels=("v",),
            Q_diag={"omega": 1e-3, "v": 1e-2, "theta": 0.0, "xi_v": 5e-2},
            R_diag={"m": 1e-1},
            bound_lo=[-1.0], bound_hi=[1.0])
        v_max = vehicle.k_m * vehicle.R / vehicle.b_m
        self.v_lim = 0.4 * v_max
        self.eta2v = C.pid_params(k_p=0.6, bound_lo=-self.v_lim,
                                  bound_hi=self.v_lim)

    def init_u(self):
        return {"mode": jnp.asarray(MODE_VELOCITY, dtype=jnp.int32),
                "m_ref": jnp.asarray(0.0), "v_ref": jnp.asarray(0.0),
                "eta_ref": jnp.asarray(0.0)}

    def init_s(self):
        return {"v2m": C.lqr_state(1), "eta2v": C.pid_state()}

    def f_periodic(self, s, u, veh_y: VehicleY, dt):
        """Returns (s, ControllerY). Both sub-controllers compute every
        firing; mode masks which state advances and which command wins
        (`robot2d.jl:379-407`)."""
        mode = u["mode"]
        pos_active = mode == MODE_POSITION
        vel_active = jnp.logical_or(mode == MODE_VELOCITY, pos_active)

        # position loop
        s_eta, eta_out = C.pid_step(self.eta2v, s["eta2v"],
                                    u["eta_ref"] - veh_y.eta, dt)
        s_eta = tree_where(pos_active, s_eta, s["eta2v"])
        v_ref = jnp.where(pos_active, eta_out.output, u["v_ref"])

        # velocity loop
        x_ctl = jnp.stack([veh_y.omega, veh_y.v, veh_y.theta], axis=-1)
        z = veh_y.v[..., None]
        z_ref = jnp.clip(v_ref, -self.v_lim, self.v_lim)[..., None]
        s_v2m, v2m_out = C.lqr_step(self.v2m, s["v2m"], x_ctl, z, z_ref, dt)
        s_v2m = tree_where(vel_active, s_v2m, s["v2m"])
        m_cmd = jnp.where(vel_active, v2m_out.output[..., 0], u["m_ref"])
        m_cmd = jnp.clip(m_cmd, -1.0, 1.0)

        y = ControllerY(mode=mode, m_ref=u["m_ref"], v_ref=v_ref,
                        eta_ref=u["eta_ref"], m_cmd=m_cmd, v2m=v2m_out,
                        eta2v=eta_out)
        return {"v2m": s_v2m, "eta2v": s_eta}, y


class RobotY(NamedTuple):
    vehicle: VehicleY
    lost_balance: jnp.ndarray


class Robot(Component):
    """Vehicle + Controller; the controller writes the motor command at each
    periodic boundary (`robot2d.jl:544-551`)."""

    def __init__(self, vehicle: Vehicle = None):
        self.vehicle = vehicle if vehicle is not None else Vehicle()
        self.controller = Controller(self.vehicle)

    def init(self, u_m=0.0, omega=0.0, eta=0.0):
        x = {"vehicle": self.vehicle.init_x(u_m=u_m, omega=omega, eta=eta)}
        u = {"ctl": self.controller.init_u(),
             "m": jnp.asarray(float(u_m))}
        s = {"ctl": self.controller.init_s(),
             "lost_balance": jnp.asarray(False)}
        return x, u, s

    def f_ode(self, x, u, s, t):
        xd, veh_y = self.vehicle.f_ode(x["vehicle"], {"m": u["m"]}, None, t)
        # freeze the lane once balance is lost (termination-as-mask)
        alive = 1.0 - s["lost_balance"]
        xd = {"vehicle": {k: v * alive for k, v in xd.items()}}
        return xd, RobotY(vehicle=veh_y, lost_balance=s["lost_balance"])

    def f_step(self, x, u, s, t):
        lost = jnp.abs(x["vehicle"]["theta"]) > THETA_MAX
        s = dict(s)
        s["lost_balance"] = jnp.logical_or(s["lost_balance"], lost)
        return x, s

    # overwritten by Simulation with its actual periodic interval
    periodic_dt = 0.02

    def f_periodic(self, x, u, s, t, k):
        _, veh_y = self.vehicle.f_ode(x["vehicle"], {"m": u["m"]}, None, t)
        s_ctl, ctl_y = self.controller.f_periodic(s["ctl"], u["ctl"], veh_y,
                                                  self.periodic_dt)
        u = dict(u)
        u["m"] = ctl_y.m_cmd
        return x, u, {"ctl": s_ctl, "lost_balance": s["lost_balance"]}
