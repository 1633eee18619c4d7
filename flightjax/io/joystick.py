"""SDL2 joystick input via ctypes.

Mirrors `/root/reference/lib/FlightCore/src/joysticks.jl`: raw SDL2 calls
(the reference `ccall`s libsdl2 directly, `joysticks.jl:45-111`), a hotplug
device registry keyed by USB vendor/product id (`:188-220, 449-454`), typed
per-device data with axes normalized by 1/32768 and button press/release
edge detection (`:125-165`), the three supported devices (Thrustmaster
T16000M / TWCS, VKB Gladiator NXT Evo), and `exp_axis_curve` input shaping
(`:460-473`).

SDL2 is loaded lazily via ctypes; on hosts without libSDL2 every entry
point degrades gracefully (no devices found)."""

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
    """Exponential axis shaping (`joysticks.jl:460-473`)."""
    a = strength
    x0 = abs(deadzone)
    if x > 0:
        y = max(0.0, (x - x0) / (1 - x0)) * np.exp(a * (abs(x) - 1))
    else:
        y = min(0.0, (x + x0) / (1 - x0)) * np.exp(a * (abs(x) - 1))
    return y


class ButtonState(NamedTuple):
    pressed: np.ndarray      # current state
    was_pressed: np.ndarray  # rising edge since last poll
    was_released: np.ndarray


# (vendor, product) -> device profile (`joysticks.jl:236-441`)
DEVICE_PROFILES = {
    (0x044F, 0xB10A): dict(name="T16000M", n_axes=4, n_buttons=16, n_hats=1),
    (0x044F, 0xB687): dict(name="TWCS", n_axes=8, n_buttons=14, n_hats=1),
    (0x231D, 0x0200): dict(name="GladiatorNXTEvo", n_axes=6, n_buttons=29,
                           n_hats=0),
}


class Joystick(InputDevice):
    """One SDL2 joystick with normalized axes + button edge detection."""

    def __init__(self, index=0, profile=None):
        self.index = index
        self.profile = profile
        self._handle = None
        self._prev_buttons = None

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
        if self.profile is None:
            self.profile = DEVICE_PROFILES.get(
                (vid, pid), dict(name=f"generic_{vid:04x}:{pid:04x}",
                                 n_axes=4, n_buttons=12, n_hats=1))
        self._prev_buttons = np.zeros(self.profile["n_buttons"], dtype=bool)

    def get_data(self):
        """Non-blocking poll: dict(axes, buttons, hat)."""
        sdl = _load_sdl()
        sdl.SDL_JoystickUpdate()
        p = self.profile
        axes = np.array([sdl.SDL_JoystickGetAxis(self._handle, i) / 32768.0
                         for i in range(p["n_axes"])])
        btns = np.array([bool(sdl.SDL_JoystickGetButton(self._handle, i))
                         for i in range(p["n_buttons"])])
        hat = (sdl.SDL_JoystickGetHat(self._handle, 0)
               if p["n_hats"] else 0)
        buttons = ButtonState(
            pressed=btns,
            was_pressed=np.logical_and(btns, ~self._prev_buttons),
            was_released=np.logical_and(~btns, self._prev_buttons))
        self._prev_buttons = btns
        return dict(axes=axes, buttons=buttons, hat=int(hat))


def connected_joysticks():
    """Scan for plugged joysticks (`joysticks.jl:188-220`)."""
    sdl = _load_sdl()
    if sdl is None:
        return []
    sdl.SDL_JoystickUpdate()
    return [Joystick(i) for i in range(sdl.SDL_NumJoysticks())]
