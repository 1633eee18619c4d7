"""Typed joystick device layer: pure decoders for the three supported
devices (`joysticks.jl:236-441`), edge detection, per-device rescales, and
the C172 mappings driven by synthetic devices (no SDL required)."""

import numpy as np
import pytest

from flightjax.io.joystick import (BUTTON_PRESSED, BUTTON_RELEASED,
                                   BUTTON_UNCHANGED, Button,
                                   GladiatorNXTEvoData, HatButtons,
                                   T16000MData, TWCSData, exp_axis_curve,
                                   is_pressed, was_pressed, was_released)

pytestmark = pytest.mark.fast


def test_exp_axis_curve_vectorized():
    x = np.array([-1.0, -0.5, 0.0, 0.05, 0.5, 1.0])
    y = exp_axis_curve(x, strength=1.0, deadzone=0.1)
    # scalar and vector paths agree
    for xi, yi in zip(x, y):
        assert exp_axis_curve(float(xi), strength=1.0, deadzone=0.1) == \
            pytest.approx(float(yi))
    assert y[2] == 0.0 and y[3] == 0.0      # deadzone
    assert y[-1] == pytest.approx(1.0)      # full deflection passes through
    assert y[0] == pytest.approx(-1.0)
    assert abs(y[4]) < 0.5                  # expo softens the center
    with pytest.raises(ValueError):
        exp_axis_curve(1.5)
    with pytest.raises(ValueError):
        exp_axis_curve(0.5, deadzone=2.0)


def test_t16000m_decode_names_and_rescale():
    axes = [0.25, -0.5, 1.0, -1.0]  # stick_x, stick_y, stick_z, raw throttle
    btns = [False] * 16
    btns[1] = True
    data = T16000MData.decode(axes, btns, [0])
    assert data.axes.stick_x == 0.25
    assert data.axes.stick_y == -0.5
    assert data.axes.stick_z == 1.0
    assert data.axes.throttle == 1.0  # 0.5*(1-(-1)): full forward -> 1
    assert is_pressed(data.buttons.button_1)
    assert was_pressed(data.buttons.button_1)   # edge vs empty cache
    assert not is_pressed(data.buttons.button_0)

    # second poll: button released, hat pressed right (SDL bit 2)
    data2 = T16000MData.decode([0, 0, 0, 1], [False] * 16, [2], prev=data)
    assert data2.axes.throttle == 0.0  # raw +1 -> idle
    assert was_released(data2.buttons.button_1)
    assert data2.buttons.button_1.change == BUTTON_RELEASED
    assert is_pressed(data2.hat.right) and was_pressed(data2.hat.right)
    assert data2.hat.up.change == BUTTON_UNCHANGED


def test_twcs_decode_hats_and_antenna():
    axes = [0.0, 0.0, -1.0, 0.1, 0.2, 0.3, 0.4, 1.0]
    btns = [False] * 14
    btns[7] = True   # middle hat, 'right' (buttons 6..9 are the middle hat)
    btns[10] = True  # bottom hat, 'up' (buttons 10..13)
    data = TWCSData.decode(axes, btns, [1])  # top hat up (bit 1)
    assert data.axes.throttle == 1.0         # raw -1 -> full
    assert data.axes.rocker == 0.3
    assert data.axes.rudder == 0.4
    assert data.axes.antenna == 1.0          # 0.5*(1+1)
    assert is_pressed(data.hat_top.up)
    assert is_pressed(data.hat_middle.right)
    assert is_pressed(data.hat_bottom.up)
    assert not is_pressed(data.hat_middle.up)


def test_gladiator_decode_named_buttons():
    axes = [0.1, 0.2, 0.0, 0.3, 0.4, -0.6]
    btns = [False] * 29
    btns[0] = True    # fire_half
    btns[13] = True   # A4_left
    btns[25] = True   # switch_down
    btns[27] = True   # F2
    data = GladiatorNXTEvoData.decode(axes, btns, [0])
    assert data.axes.throttle == 0.5  # 0.5*(1-0)
    assert data.axes.stick_z == -0.6
    assert data.axes.analog_hat_y == 0.4
    assert is_pressed(data.buttons.fire_half)
    assert is_pressed(data.buttons.A4_left)
    assert is_pressed(data.buttons.switch_down)
    assert is_pressed(data.buttons.F2)
    assert not is_pressed(data.buttons.F3)


def _press_release(cls, n_axes, press_kw):
    """Two-poll helper: returns typed data carrying release edges for the
    buttons named in press_kw (field name -> index)."""
    axes = [0.0] * n_axes
    btns = [False] * 32
    for idx in press_kw.values():
        btns[idx] = True
    first = cls.decode(axes, btns, [0])
    return cls.decode(axes, [False] * 32, [0], prev=first)


@pytest.fixture(scope="module")
def c172s_u():
    from flightjax.models.c172 import c172s
    world = c172s.flagship_world("wa")
    return {"vehicle": world.aircraft.vehicle.init_u()}


def test_c172s_mapping_t16000m(c172s_u):
    from flightjax.models.c172.mappings import C172Sv0JoystickMapping

    m = C172Sv0JoystickMapping()
    # stick deflections + full throttle + brake held (button_1)
    btns = [False] * 16
    btns[1] = True
    data = T16000MData.decode([0.5, -0.5, 0.2, -1.0], btns, [0])
    u2 = m.assign_input(c172s_u, data)
    act = u2["vehicle"]["systems"]["act"]
    assert float(act["throttle"]) == 1.0
    assert float(act["aileron"]) > 0.1
    assert float(act["elevator"]) < -0.1
    assert float(act["brake_left"]) == 1.0 and float(act["brake_right"]) == 1.0

    # flaps advance on button_3 release, retract on button_2 release
    d2 = _press_release(T16000MData, 4, dict(b3=3))
    u3 = m.assign_input(u2, d2)
    assert float(u3["vehicle"]["systems"]["act"]["flaps"]) == \
        pytest.approx(0.3333)

    # elevator trim via hat: one down-click moves the offset by +2e-4
    hat_down = T16000MData.decode([0] * 4, [False] * 16, [4])
    released = T16000MData.decode([0] * 4, [False] * 16, [0], prev=hat_down)
    u4 = m.assign_input(u3, released)
    assert float(u4["vehicle"]["systems"]["act"]["elevator_offset"]) == \
        pytest.approx(2e-4)


def test_c172s_mapping_twcs_is_throttle_only(c172s_u):
    from flightjax.models.c172.mappings import C172Sv0JoystickMapping

    m = C172Sv0JoystickMapping()
    stick = T16000MData.decode([0.5, -0.5, 0.0, 0.0], [False] * 16, [0])
    u2 = m.assign_input(c172s_u, stick)
    ail0 = float(u2["vehicle"]["systems"]["act"]["aileron"])
    # TWCS at full throttle, rocker deflected
    twcs = TWCSData.decode([0, 0, -1.0, 0, 0, 0.5, 0, 0], [False] * 14, [0])
    u3 = m.assign_input(u2, twcs)
    act = u3["vehicle"]["systems"]["act"]
    assert float(act["throttle"]) == 1.0
    assert float(act["rudder"]) > 0.0           # rocker -> rudder
    assert float(act["aileron"]) == ail0        # stick command untouched


def test_c172s_mapping_gladiator(c172s_u):
    from flightjax.models.c172.mappings import C172Sv0JoystickMapping

    m = C172Sv0JoystickMapping()
    btns = [False] * 29
    btns[27] = True  # F2: left brake
    data = GladiatorNXTEvoData.decode([0.3, 0.0, -1.0, 0, 0, 0.0], btns, [0])
    u2 = m.assign_input(c172s_u, data)
    act = u2["vehicle"]["systems"]["act"]
    assert float(act["throttle"]) == 1.0
    assert float(act["aileron"]) > 0.05
    assert float(act["brake_left"]) == 1.0
    assert float(act["brake_right"]) == 0.0     # F3 not pressed


@pytest.fixture(scope="module")
def c172x_u():
    import os

    from flightjax.models.c172.c172x_design import GAINS_PATH
    if not os.path.exists(GAINS_PATH):
        pytest.skip("gains not generated")
    from flightjax.models.c172 import c172x

    aircraft = c172x.build_xv1("wa")
    u = {"vehicle": aircraft.vehicle.init_u(),
         "avionics": aircraft.avionics.init_u()}
    return u


def test_c172x_mapping_t16000m(c172x_u):
    from flightjax.models.c172.mappings import C172Xv1JoystickMapping

    m = C172Xv1JoystickMapping()
    data = T16000MData.decode([0.5, -0.5, 0.0, -1.0], [False] * 16, [0])
    u2 = m.assign_input(c172x_u, data)
    lon, lat = u2["avionics"]["lon"], u2["avionics"]["lat"]
    assert float(lon["throttle_axis"]) == 1.0
    assert float(lon["q_ref"]) == pytest.approx(
        0.5 * float(lon["elevator_axis"]))
    assert float(lat["p_ref"]) == pytest.approx(
        0.5 * float(lat["aileron_axis"]))

    # trim: elevator_offset moves on hat down release (`c172x1.jl:50-51`)
    hat_down = T16000MData.decode([0] * 4, [False] * 16, [4])
    rel = T16000MData.decode([0] * 4, [False] * 16, [0], prev=hat_down)
    u3 = m.assign_input(u2, rel)
    assert float(u3["avionics"]["lon"]["elevator_offset"]) == \
        pytest.approx(5e-3)


def test_c172x_mapping_gladiator_a4_trim_and_f_brakes(c172x_u):
    from flightjax.models.c172.mappings import C172Xv1JoystickMapping

    m = C172Xv1JoystickMapping()
    # A4_right release -> aileron_offset += 5e-3 (`c172x1.jl:89-92`)
    btns = [False] * 29
    btns[11] = True  # A4_right
    first = GladiatorNXTEvoData.decode([0] * 6, btns, [0])
    rel = GladiatorNXTEvoData.decode([0] * 6, [False] * 29, [0], prev=first)
    u2 = m.assign_input(c172x_u, rel)
    assert float(u2["avionics"]["lat"]["aileron_offset"]) == \
        pytest.approx(5e-3)

    # F2/F3 drive the brakes separately
    btns = [False] * 29
    btns[28] = True  # F3: right brake only
    data = GladiatorNXTEvoData.decode([0] * 6, btns, [0])
    u3 = m.assign_input(u2, data)
    act = u3["vehicle"]["systems"]["act"]
    assert float(act["brake_left"]) == 0.0
    assert float(act["brake_right"]) == 1.0


def test_c172x_mapping_twcs_throttle(c172x_u):
    from flightjax.models.c172.mappings import C172Xv1JoystickMapping

    m = C172Xv1JoystickMapping()
    twcs = TWCSData.decode([0, 0, -1.0, 0, 0, -0.4, 0, 0], [False] * 14, [0])
    u2 = m.assign_input(c172x_u, twcs)
    assert float(u2["avionics"]["lon"]["throttle_axis"]) == 1.0
    assert float(u2["avionics"]["lat"]["rudder_axis"]) < 0.0
