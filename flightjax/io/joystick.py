"""SDL2 joystick input via ctypes, with typed per-device data.

Mirrors `/root/reference/lib/FlightCore/src/joysticks.jl`: raw SDL2 calls
(the reference `ccall`s libsdl2 directly, `joysticks.jl:45-111`), a hotplug
device registry keyed by USB vendor/product id (`:188-220, 449-454`), typed
per-device data with every axis/button/hat NAMED, axes normalized by
1/32768 with per-device rescales, and button press/release edge detection
(`:125-165`). Three devices ship with full semantic structs, exactly the
reference set:

- Thrustmaster T16000M stick     (`joysticks.jl:236-282`)
- Thrustmaster TWCS throttle     (`:288-356`)
- VKB Gladiator NXT Evo stick    (`:363-441`)

Decoding is PURE — `T16000MData.decode(axes, buttons, hats, prev)` maps raw
SDL readings to the typed struct, so mappings are testable with synthetic
devices and no SDL. The SDL layer is loaded lazily via ctypes; on hosts
without libSDL2 every entry point degrades gracefully (no devices found).

`exp_axis_curve` input shaping (`joysticks.jl:460-473`) is vectorized: it
shapes scalars or whole axes arrays.
"""

import ctypes
import ctypes.util
from typing import NamedTuple

import numpy as np

from flightjax.io.devices import InputDevice

SDL_INIT_JOYSTICK = 0x00000200

_sdl = None


def _load_sdl():
    global _sdl
    if _sdl is not None:
        return _sdl
    path = ctypes.util.find_library("SDL2")
    if path is None:
        return None
    sdl = ctypes.CDLL(path)
    sdl.SDL_Init(SDL_INIT_JOYSTICK)
    sdl.SDL_JoystickOpen.restype = ctypes.c_void_p
    sdl.SDL_JoystickName.restype = ctypes.c_char_p
    sdl.SDL_JoystickGetAxis.argtypes = [ctypes.c_void_p, ctypes.c_int]
    sdl.SDL_JoystickGetAxis.restype = ctypes.c_int16
    sdl.SDL_JoystickGetButton.argtypes = [ctypes.c_void_p, ctypes.c_int]
    sdl.SDL_JoystickGetButton.restype = ctypes.c_uint8
    sdl.SDL_JoystickGetHat.argtypes = [ctypes.c_void_p, ctypes.c_int]
    sdl.SDL_JoystickGetHat.restype = ctypes.c_uint8
    sdl.SDL_JoystickGetVendor.argtypes = [ctypes.c_void_p]
    sdl.SDL_JoystickGetVendor.restype = ctypes.c_uint16
    sdl.SDL_JoystickGetProduct.argtypes = [ctypes.c_void_p]
    sdl.SDL_JoystickGetProduct.restype = ctypes.c_uint16
    _sdl = sdl
    return sdl


def exp_axis_curve(x, strength=0.0, deadzone=0.0):
    """Exponential axis shaping (`joysticks.jl:460-473`). Vectorized: `x`
    may be a scalar or an array of axes; bounds are validated as in the
    reference."""
    x = np.asarray(x, dtype=float)
    if np.any(np.abs(x) > 1):
        raise ValueError("input to exponential curve must be within [-1, 1]")
    if not 0.0 <= deadzone <= 1.0:
        raise ValueError("exponential curve deadzone must be within [0, 1]")
    a, x0 = strength, deadzone
    pos = np.maximum(0.0, (x - x0) / (1 - x0))
    neg = np.minimum(0.0, (x + x0) / (1 - x0))
    y = np.where(x > 0, pos, neg) * np.exp(a * (np.abs(x) - 1))
    return float(y) if y.ndim == 0 else y


# ------------------------------------------------------- button primitives

BUTTON_UNCHANGED, BUTTON_PRESSED, BUTTON_RELEASED = 0, 1, 2


class Button(NamedTuple):
    """One button: current state + edge since the previous poll (the
    reference's ButtonData, `joysticks.jl:147-157`)."""
    state: bool = False
    change: int = BUTTON_UNCHANGED


def is_pressed(b: Button) -> bool:
    return b.state is True


def was_pressed(b: Button) -> bool:
    return b.change == BUTTON_PRESSED


def was_released(b: Button) -> bool:
    return b.change == BUTTON_RELEASED


def _change(state: bool, last: bool) -> int:
    if state and not last:
        return BUTTON_PRESSED
    if last and not state:
        return BUTTON_RELEASED
    return BUTTON_UNCHANGED


class HatButtons(NamedTuple):
    """4-way hat as four Buttons (`joysticks.jl:160-165`)."""
    up: Button = Button()
    right: Button = Button()
    down: Button = Button()
    left: Button = Button()


def _edge_set(cls, states, prev):
    """Build a Button NamedTuple with edges vs the previous instance."""
    last = ([b.state for b in prev] if prev is not None
            else [False] * len(states))
    return cls(*[Button(bool(s), _change(bool(s), p))
                 for s, p in zip(states, last)])


def _hat_bits(hat_byte):
    """SDL hat byte -> (up, right, down, left) booleans."""
    return [bool(hat_byte & m) for m in (1, 2, 4, 8)]


class ButtonState(NamedTuple):
    """Legacy array-form button set (kept for generic/unknown devices)."""
    pressed: np.ndarray      # current state
    was_pressed: np.ndarray  # rising edge since last poll
    was_released: np.ndarray


# ------------------------------------------------- Thrustmaster T16000M

class T16000MAxes(NamedTuple):
    """`joysticks.jl:236-241`. `throttle` is rescaled to [0, 1]."""
    stick_x: float = 0.0
    stick_y: float = 0.0
    stick_z: float = 0.0
    throttle: float = 0.0


class T16000MButtons(NamedTuple):
    button_0: Button = Button(); button_1: Button = Button()
    button_2: Button = Button(); button_3: Button = Button()
    button_4: Button = Button(); button_5: Button = Button()
    button_6: Button = Button(); button_7: Button = Button()
    button_8: Button = Button(); button_9: Button = Button()
    button_10: Button = Button(); button_11: Button = Button()
    button_12: Button = Button(); button_13: Button = Button()
    button_14: Button = Button(); button_15: Button = Button()


class T16000MData(NamedTuple):
    """`joysticks.jl:250-282`."""
    axes: T16000MAxes = T16000MAxes()
    buttons: T16000MButtons = T16000MButtons()
    hat: HatButtons = HatButtons()

    n_axes, n_buttons, n_hats = 4, 16, 1

    @classmethod
    def decode(cls, axes, buttons, hats, prev=None):
        a = list(axes)
        ax = T16000MAxes(stick_x=a[0], stick_y=a[1], stick_z=a[2],
                         throttle=0.5 * (1 - a[3]))
        btn = _edge_set(T16000MButtons, buttons[:16],
                        prev.buttons if prev else None)
        hat = _edge_set(HatButtons, _hat_bits(hats[0]),
                        prev.hat if prev else None)
        return cls(ax, btn, hat)


# ------------------------------------------------ Thrustmaster TWCS throttle

class TWCSAxes(NamedTuple):
    """`joysticks.jl:288-297`. `throttle` rescaled to [0, 1] (full forward
    = 1), `antenna` to [0, 1]; pedals/rudder only live with a TFRP
    connected."""
    mini_stick_x: float = 0.0
    mini_stick_y: float = 0.0
    throttle: float = 0.0
    right_pedal: float = 0.0
    left_pedal: float = 0.0
    rocker: float = 0.0
    rudder: float = 0.0
    antenna: float = 0.0


class TWCSButtons(NamedTuple):
    """`joysticks.jl:299-306` — physical buttons; the three hats are
    separate fields on TWCSData."""
    button_0: Button = Button()  # orange button below the right-side hats
    button_1: Button = Button()  # orange button on the front, leftmost
    button_2: Button = Button()  # orange button on the front, rightmost
    button_3: Button = Button()  # vertical lever up
    button_4: Button = Button()  # vertical lever down
    button_5: Button = Button()  # mini stick push button


class TWCSData(NamedTuple):
    """`joysticks.jl:308-347`: top hat is a true SDL hat; middle/bottom
    hats report as buttons 6-9 and 10-13."""
    axes: TWCSAxes = TWCSAxes()
    buttons: TWCSButtons = TWCSButtons()
    hat_top: HatButtons = HatButtons()
    hat_middle: HatButtons = HatButtons()
    hat_bottom: HatButtons = HatButtons()

    n_axes, n_buttons, n_hats = 8, 14, 1

    @classmethod
    def decode(cls, axes, buttons, hats, prev=None):
        a = list(axes)
        ax = TWCSAxes(mini_stick_x=a[0], mini_stick_y=a[1],
                      throttle=0.5 * (1 - a[2]), right_pedal=a[3],
                      left_pedal=a[4], rocker=a[5], rudder=a[6],
                      antenna=0.5 * (a[7] + 1))
        btn = _edge_set(TWCSButtons, buttons[:6],
                        prev.buttons if prev else None)
        h_top = _edge_set(HatButtons, _hat_bits(hats[0]),
                          prev.hat_top if prev else None)
        h_mid = _edge_set(HatButtons, buttons[6:10],
                          prev.hat_middle if prev else None)
        h_bot = _edge_set(HatButtons, buttons[10:14],
                          prev.hat_bottom if prev else None)
        return cls(ax, btn, h_top, h_mid, h_bot)


# --------------------------------------------- VKBSim Gladiator NXT Evo

class GladiatorNXTEvoAxes(NamedTuple):
    """`joysticks.jl:363-370`. `throttle` rescaled to [0, 1]."""
    stick_x: float = 0.0
    stick_y: float = 0.0
    throttle: float = 0.0
    analog_hat_x: float = 0.0
    analog_hat_y: float = 0.0
    stick_z: float = 0.0


class GladiatorNXTEvoButtons(NamedTuple):
    """`joysticks.jl:372-404`: SDL reports 132 buttons; the first 29 are
    physical and named here."""
    fire_half: Button = Button(); fire_full: Button = Button()
    A2: Button = Button(); B1: Button = Button(); D1: Button = Button()
    A3_up: Button = Button(); A3_right: Button = Button()
    A3_down: Button = Button(); A3_left: Button = Button()
    A3_press: Button = Button()
    A4_up: Button = Button(); A4_right: Button = Button()
    A4_down: Button = Button(); A4_left: Button = Button()
    A4_press: Button = Button()
    C1_up: Button = Button(); C1_right: Button = Button()
    C1_down: Button = Button(); C1_left: Button = Button()
    C1_press: Button = Button()
    black_trigger_up: Button = Button()
    black_trigger_down: Button = Button()
    encoder_up: Button = Button(); encoder_down: Button = Button()
    switch_up: Button = Button(); switch_down: Button = Button()
    F1: Button = Button(); F2: Button = Button(); F3: Button = Button()


class GladiatorNXTEvoData(NamedTuple):
    """`joysticks.jl:407-436`."""
    axes: GladiatorNXTEvoAxes = GladiatorNXTEvoAxes()
    buttons: GladiatorNXTEvoButtons = GladiatorNXTEvoButtons()
    hat: HatButtons = HatButtons()

    n_axes, n_buttons, n_hats = 6, 29, 1

    @classmethod
    def decode(cls, axes, buttons, hats, prev=None):
        a = list(axes)
        ax = GladiatorNXTEvoAxes(stick_x=a[0], stick_y=a[1],
                                 throttle=0.5 * (1 - a[2]),
                                 analog_hat_x=a[3], analog_hat_y=a[4],
                                 stick_z=a[5])
        btn = _edge_set(GladiatorNXTEvoButtons, buttons[:29],
                        prev.buttons if prev else None)
        hat = _edge_set(HatButtons, _hat_bits(hats[0] if hats else 0),
                        prev.hat if prev else None)
        return cls(ax, btn, hat)


# (vendor, product) -> typed data class (`joysticks.jl:443-454`)
SUPPORTED_JOYSTICKS = {
    (0x044F, 0xB10A): T16000MData,
    (0x044F, 0xB687): TWCSData,
    (0x231D, 0x0200): GladiatorNXTEvoData,
}

# legacy generic profiles (unknown devices fall back to the dict form)
DEVICE_PROFILES = {
    usb: dict(name=cls.__name__.removesuffix("Data"), n_axes=cls.n_axes,
              n_buttons=cls.n_buttons, n_hats=cls.n_hats)
    for usb, cls in SUPPORTED_JOYSTICKS.items()
}


class Joystick(InputDevice):
    """One SDL2 joystick. Recognized devices (SUPPORTED_JOYSTICKS) poll to
    their typed data struct with named axes/buttons and edge detection;
    unknown devices return the generic dict(axes, buttons, hat) form."""

    def __init__(self, index=0, profile=None, data_cls=None):
        self.index = index
        self.profile = profile
        self.data_cls = data_cls
        self._handle = None
        self._prev = None          # typed: previous Data instance
        self._prev_buttons = None  # generic: previous bool array

    def init(self):
        sdl = _load_sdl()
        if sdl is None:
            raise RuntimeError("libSDL2 not available on this host")
        sdl.SDL_JoystickUpdate()
        self._handle = sdl.SDL_JoystickOpen(self.index)
        if not self._handle:
            raise RuntimeError(f"cannot open joystick {self.index}")
        vid = sdl.SDL_JoystickGetVendor(self._handle)
        pid = sdl.SDL_JoystickGetProduct(self._handle)
        if self.data_cls is None:
            self.data_cls = SUPPORTED_JOYSTICKS.get((vid, pid))
        if self.profile is None:
            self.profile = DEVICE_PROFILES.get(
                (vid, pid), dict(name=f"generic_{vid:04x}:{pid:04x}",
                                 n_axes=4, n_buttons=12, n_hats=1))
        self._prev_buttons = np.zeros(self.profile["n_buttons"], dtype=bool)

    def _poll_raw(self, n_axes, n_buttons, n_hats):
        sdl = _load_sdl()
        sdl.SDL_JoystickUpdate()
        axes = [sdl.SDL_JoystickGetAxis(self._handle, i) / 32768.0
                for i in range(n_axes)]
        btns = [bool(sdl.SDL_JoystickGetButton(self._handle, i))
                for i in range(n_buttons)]
        hats = [int(sdl.SDL_JoystickGetHat(self._handle, i))
                for i in range(n_hats)]
        return axes, btns, hats

    def get_data(self):
        """Non-blocking poll: a typed Data struct for supported devices,
        else dict(axes, buttons, hat)."""
        if self.data_cls is not None:
            cls = self.data_cls
            axes, btns, hats = self._poll_raw(cls.n_axes, cls.n_buttons,
                                              max(cls.n_hats, 1))
            data = cls.decode(axes, btns, hats, prev=self._prev)
            self._prev = data
            return data
        p = self.profile
        axes, btns, hats = self._poll_raw(p["n_axes"], p["n_buttons"],
                                          max(p["n_hats"], 1))
        axes = np.asarray(axes)
        btns = np.asarray(btns)
        buttons = ButtonState(
            pressed=btns,
            was_pressed=np.logical_and(btns, ~self._prev_buttons),
            was_released=np.logical_and(~btns, self._prev_buttons))
        self._prev_buttons = btns
        return dict(axes=axes, buttons=buttons,
                    hat=int(hats[0]) if p["n_hats"] else 0)


def connected_joysticks():
    """Scan for plugged joysticks (`joysticks.jl:188-220`)."""
    sdl = _load_sdl()
    if sdl is None:
        return []
    sdl.SDL_JoystickUpdate()
    return [Joystick(i) for i in range(sdl.SDL_NumJoysticks())]
