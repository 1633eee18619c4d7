import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import dynamics as D
from flightjax.physics import kinematics as K
from flightjax.ops import geodesy as geo
from flightjax.ops.quaternions import qidentity
from flightjax.ops.attitude import rot_z


def test_wrench_translate():
    # force at a point offset generates a torque
    wr_c = D.Wrench(F=jnp.asarray([0.0, 0.0, -10.0]), tau=jnp.zeros(3))
    t_bc = D.FrameTransform(r=jnp.asarray([2.0, 0.0, 0.0]), q=qidentity())
    wr_b = D.translate_wrench(t_bc, wr_c)
    np.testing.assert_allclose(wr_b.F, [0, 0, -10], atol=1e-12)
    np.testing.assert_allclose(wr_b.tau, [0, 20.0, 0], atol=1e-12)  # r x F
    # with rotation: F rotates first
    t2 = D.FrameTransform(r=jnp.zeros(3), q=rot_z(jnp.pi / 2))
    wr2 = D.translate_wrench(t2, D.Wrench(F=jnp.asarray([1.0, 0, 0]), tau=jnp.zeros(3)))
    np.testing.assert_allclose(wr2.F, [0, 1, 0], atol=1e-12)


def test_mass_props_point_and_aggregate():
    mp1 = D.mass_props_point(2.0, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(mp1.m, 2.0)
    # inertia of point mass at distance 1 along x: Jyy = Jzz = m r^2 = 2
    np.testing.assert_allclose(mp1.J, np.diag([0.0, 2.0, 2.0]), atol=1e-12)
    mp2 = D.mass_props_point(2.0, jnp.asarray([-1.0, 0.0, 0.0]))
    tot = mp1 + mp2
    np.testing.assert_allclose(tot.m, 4.0)
    np.testing.assert_allclose(tot.r_OG, [0.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(tot.J, np.diag([0.0, 4.0, 4.0]), atol=1e-12)


def test_mass_props_rigid_steiner_roundtrip():
    J_G = jnp.diag(jnp.asarray([1.0, 2.0, 3.0]))
    r = jnp.asarray([0.5, -0.2, 0.1])
    t_bc = D.FrameTransform(r=r, q=qidentity())
    mp_b = D.mass_props_rigid(10.0, J_G, t_bc)
    # translate back to the CoM frame: J must recover J_G
    t_cb = D.ft_inv(t_bc)
    mp_c = D.translate_mass_props(t_cb, mp_b)
    np.testing.assert_allclose(mp_c.J, J_G, atol=1e-12)
    np.testing.assert_allclose(mp_c.r_OG, np.zeros(3), atol=1e-12)
    # rotation path: rotating 90 deg about z swaps Jxx and Jyy
    t_rot = D.FrameTransform(r=jnp.zeros(3), q=rot_z(jnp.pi / 2))
    mp_rot = D.mass_props_rigid(10.0, J_G, t_rot)
    np.testing.assert_allclose(mp_rot.J, np.diag([2.0, 1.0, 3.0]), atol=1e-12)


def _dyn_inputs(kin, mp_b, wr_b=None, ho=None):
    if wr_b is None:
        wr_b = D.wrench_zero()
    if ho is None:
        ho = jnp.zeros(3)
    return D.DynamicsU(mp_sum_b=mp_b, wr_sum_b=wr_b, ho_sum_b=ho,
                       q_eb=kin.q_eb, r_eb_e=kin.r_eb_e)


def test_free_fall():
    """No external forces: v̇ in NED is gravity + Coriolis; at rest it's
    exactly g (in the NED-aligned body frame)."""
    ic = K.kin_init(lat=0.4, lon=0.1, h=1000.0)
    kin = K.kin_data_from_init(ic)
    dyn = D.VehicleDynamics()
    mp = D.mass_props_rigid(100.0, jnp.eye(3) * 10.0, D.ft_identity())
    u = _dyn_inputs(kin, mp)
    x = dyn.init_x()
    xdot, y = dyn.f_ode(x, u, None, 0.0)
    g = float(geo.gravity(ic.n_e, ic.h_e))
    np.testing.assert_allclose(xdot["v_eb_b"], [0.0, 0.0, g], atol=1e-9)
    np.testing.assert_allclose(xdot["omega_eb_b"], np.zeros(3), atol=1e-9)
    np.testing.assert_allclose(y.f_c_c, np.zeros(3), atol=1e-9)  # free fall: zero specific force


def test_hover_balance():
    """Upward force m*g at the CoM exactly cancels gravity (minus the
    centrifugal-free comparison: use specific force output)."""
    ic = K.kin_init(lat=0.4, lon=0.1, h=500.0)
    kin = K.kin_data_from_init(ic)
    dyn = D.VehicleDynamics()
    m = 250.0
    mp = D.mass_props_rigid(m, jnp.eye(3) * 50.0, D.ft_identity())
    g = float(geo.gravity(ic.n_e, ic.h_e))
    wr = D.Wrench(F=jnp.asarray([0.0, 0.0, -m * g]), tau=jnp.zeros(3))
    xdot, y = dyn.f_ode(dyn.init_x(), _dyn_inputs(kin, mp, wr), None, 0.0)
    np.testing.assert_allclose(xdot["v_eb_b"], np.zeros(3), atol=1e-9)
    np.testing.assert_allclose(y.f_c_c, [0, 0, -g], atol=1e-9)


def test_torque_about_com():
    """Pure torque: omega_dot = J^-1 tau (Earth-rotation terms ~1e-4)."""
    ic = K.kin_init(lat=0.0, lon=0.0, h=0.0)
    kin = K.kin_data_from_init(ic)
    dyn = D.VehicleDynamics()
    J = jnp.diag(jnp.asarray([10.0, 20.0, 40.0]))
    mp = D.mass_props_rigid(100.0, J, D.ft_identity())
    wr = D.Wrench(F=jnp.zeros(3), tau=jnp.asarray([1.0, 2.0, 4.0]))
    xdot, _ = dyn.f_ode(dyn.init_x(), _dyn_inputs(kin, mp, wr), None, 0.0)
    np.testing.assert_allclose(xdot["omega_eb_b"], [0.1, 0.1, 0.1], atol=1e-4)


def test_offset_com_force_couples():
    """Force at body origin with CoM offset produces angular acceleration."""
    ic = K.kin_init(lat=0.0, lon=0.0, h=0.0)
    kin = K.kin_data_from_init(ic)
    dyn = D.VehicleDynamics()
    t_bc = D.FrameTransform(r=jnp.asarray([1.0, 0.0, 0.0]), q=qidentity())
    mp = D.mass_props_rigid(10.0, jnp.eye(3), t_bc)  # CoM 1 m ahead of Ob
    wr = D.Wrench(F=jnp.asarray([0.0, 0.0, -100.0]), tau=jnp.zeros(3))  # lift at Ob
    xdot, _ = dyn.f_ode(dyn.init_x(), _dyn_inputs(kin, mp, wr), None, 0.0)
    # torque about CoM = (-r_OG) x F = (-1,0,0)x(0,0,-100) = (0,-100,0) →
    # pitch-down; Jyy about CoM = 1
    np.testing.assert_allclose(xdot["omega_eb_b"][1], -100.0, rtol=1e-3)


def test_spinning_rotor_gyroscopic():
    """Internal angular momentum h0 along x and body rate about z produces
    gyroscopic pitch torque: omega_dot = -J^-1 (omega x h0)."""
    ic = K.kin_init(lat=0.0, lon=0.0, h=0.0)
    kin = K.kin_data_from_init(ic)
    dyn = D.VehicleDynamics()
    J = jnp.eye(3) * 10.0
    mp = D.mass_props_rigid(100.0, J, D.ft_identity())
    ho = jnp.asarray([50.0, 0.0, 0.0])
    x = {"omega_eb_b": jnp.asarray([0.0, 0.0, 0.2]), "v_eb_b": jnp.zeros(3)}
    xdot, _ = dyn.f_ode(x, _dyn_inputs(kin, mp, ho=ho), None, 0.0)
    # omega x h0 = (0,0,0.2)x(50,0,0) = (0,10,0); omega_dot_y = -10/10 = -1
    np.testing.assert_allclose(xdot["omega_eb_b"][1], -1.0, atol=1e-3)


def test_free_fall_trajectory():
    """Closed loop: dynamics x feeds kinematics u. Drop from rest for 5 s:
    h loss ≈ g t²/2 (with tiny Coriolis deflection)."""
    from flightjax.core.modeling import Component
    from flightjax.core.sim import Simulation, SimState

    class FallingBody(Component):
        def __init__(self):
            self.kin = K.WA()
            self.dyn = D.VehicleDynamics()
            self.mp = D.mass_props_rigid(10.0, jnp.eye(3), D.ft_identity())

        def f_ode(self, x, u, s, t):
            kin_u = K.vel_input(x["dyn"]["omega_eb_b"], x["dyn"]["v_eb_b"])
            kin_dot, kin_y = self.kin.f_ode(x["kin"], kin_u, None, t)
            dyn_u = D.DynamicsU(mp_sum_b=self.mp, wr_sum_b=D.wrench_zero(),
                                ho_sum_b=jnp.zeros(3), q_eb=kin_y.q_eb,
                                r_eb_e=kin_y.r_eb_e)
            dyn_dot, dyn_y = self.dyn.f_ode(x["dyn"], dyn_u, None, t)
            return {"kin": kin_dot, "dyn": dyn_dot}, kin_y

        def f_step(self, x, u, s, t):
            xk, _ = self.kin.f_step(x["kin"], None, None, t)
            return {"kin": xk, "dyn": x["dyn"]}, s

    body = FallingBody()
    ic = K.kin_init(lat=0.4, lon=-0.3, h=2000.0)
    x0 = {"kin": body.kin.init_x(ic), "dyn": body.dyn.init_x()}
    sim = Simulation(body, dt=0.01)
    st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32), x=x0,
                  u=None, s=None)
    st, _ = sim.run(st, t_end=5.0, save_y=False)
    _, y = body.f_ode(st.x, None, None, st.t)
    g = float(geo.gravity(ic.n_e, ic.h_e))
    drop = 2000.0 - float(y.h_e)
    np.testing.assert_allclose(drop, 0.5 * g * 25.0, rtol=1e-3)
    # Coriolis deflects eastward (northern hemisphere, falling): v_E > 0
    assert float(y.v_eb_n[1]) > 0


pytestmark = pytest.mark.fast
