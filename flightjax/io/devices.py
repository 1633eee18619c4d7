"""Abstract I/O device layer.

Mirrors `/root/reference/lib/FlightCore/src/iodevices.jl`: the `IODevice`
lifecycle (`init/shutdown/should_close/interrupt`, `iodevices.jl:27-36`),
blocking `InputDevice.get_data` / `OutputDevice.handle_data`, and the
mapping dispatch `assign_input` / `extract_output` (`:38-51`). Malformed
external input raises `InputMappingError` and is tolerated by the runtime
loop (`:53-69`)."""


class InputMappingError(Exception):
    """Raised by a mapping when external data is malformed; the interface
    thread logs and continues (`iodevices.jl:53-69`)."""


class IODevice:
    def init(self):
        pass

    def shutdown(self):
        pass

    def should_close(self):
        return False

    def interrupt(self):
        """Unblock a pending blocking call (e.g. close a socket)."""


class InputDevice(IODevice):
    def get_data(self):
        """May block. Returns raw device data or None on shutdown."""
        raise NotImplementedError


class OutputDevice(IODevice):
    def handle_data(self, data):
        raise NotImplementedError


class IOMapping:
    """Bidirectional mapping between a device and the simulation state."""

    def assign_input(self, u, data):
        """Map raw device data onto the model input pytree; returns new u."""
        raise InputMappingError(f"no input mapping for {type(self).__name__}")

    def extract_output(self, state, y):
        """Extract device data from the latest (SimState, output) snapshot."""
        raise InputMappingError(f"no output mapping for {type(self).__name__}")


class GenericInputMapping(IOMapping):
    """Fallback mapping (`iodevices.jl:16`): hands raw device data straight
    to a model-provided `assign_input(u, data)` hook if the target defines
    one, otherwise raises `InputMappingError`."""


def get_default_mapping(device: IODevice) -> IOMapping:
    """Default mapping for a device (`iodevices.jl:23-25`). Devices override
    by defining a `default_mapping()` method; otherwise there is no default
    and the caller must pass a mapping to `attach`."""
    factory = getattr(device, "default_mapping", None)
    if factory is None:
        raise TypeError(
            f"{type(device).__name__} has no default mapping; pass one to "
            "attach(device, mapping)")
    return factory()
