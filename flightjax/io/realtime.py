"""Real-time interactive simulation loop with attached I/O devices.

Mirrors `/root/reference/lib/FlightCore/src/sim.jl`:
- `SimControl` pause/pace/abort flags guarded by one lock (`sim.jl:52-64`)
- one thread per attached interface + the sim loop (`:611-638`); input
  threads block on their device and assign into the model input under the
  lock (`:117-141`); output threads extract snapshots and push them to the
  device (`:142-152`)
- real-time pacing by (busy-)waiting on the wall clock (`:541-553`);
  pace=inf runs unpaced
- graceful termination: a device may request closing; the sim end
  interrupts blocked inputs (`:563-599`); malformed input is tolerated
  (`iodevices.jl:53-69`)

The device boundary: the jitted step runs on the accelerator; each save
point the latest SimState is `jax.device_get` to the host for the output
mappings — the dispatched-snapshot pattern of `sim.jl:142-152`.
"""

import threading
import time

import jax

from flightjax.io.devices import InputMappingError


class SimControl:
    def __init__(self, pace=1.0):
        self.lock = threading.RLock()
        self.pace = pace
        self.paused = False
        self.abort = False
        self.iter = 0
        self.t_sim = 0.0
        self.t_wall = 0.0


class Interface:
    def __init__(self, device, mapping, period=0.02):
        self.device = device
        self.mapping = mapping
        self.period = period


class RealTimeLoop:
    """Drive a `flightjax.core.sim.Simulation` in real time with devices.

    loop = RealTimeLoop(sim, state)
    loop.attach(XPlane12Control(), mapping)
    loop.run(t_end=60, pace=1.0)
    """

    def __init__(self, sim, state, ctx=()):
        self.sim = sim
        self.state = state
        self.ctx = ctx
        self.control = SimControl()
        self.interfaces = []
        self._step = jax.jit(lambda st: sim.step(st, ctx))
        self._output = jax.jit(lambda st: sim.output(st, ctx))

    def attach(self, device, mapping=None, period=0.02):
        if mapping is None:
            from flightjax.io.devices import get_default_mapping
            mapping = get_default_mapping(device)
        self.interfaces.append(Interface(device, mapping, period))

    # ------------------------------------------------------------- threads

    def _input_thread(self, iface):
        while not self.control.abort and not iface.device.should_close():
            data = iface.device.get_data()
            if data is None:
                if iface.device.should_close():
                    with self.control.lock:
                        self.control.abort = True
                break
            try:
                with self.control.lock:
                    new_u = iface.mapping.assign_input(self.state.u, data)
                    self.state = self.state._replace(u=new_u)
            except InputMappingError as exc:
                print(f"[realtime] ignored malformed input: {exc}")

    def _output_thread(self, iface):
        while not self.control.abort:
            t0 = time.monotonic()
            with self.control.lock:
                snapshot = jax.device_get(self.state)
                y = jax.device_get(self._output(self.state))
            try:
                iface.device.handle_data(
                    iface.mapping.extract_output(snapshot, y))
            except InputMappingError as exc:
                print(f"[realtime] output mapping failed: {exc}")
            dt_left = iface.period - (time.monotonic() - t0)
            if dt_left > 0:
                time.sleep(dt_left)

    # ----------------------------------------------------------------- run

    def run(self, t_end, pace=1.0):
        ctl = self.control
        ctl.pace = pace
        for iface in self.interfaces:
            iface.device.init()

        from flightjax.io.devices import InputDevice, OutputDevice

        threads = []
        for iface in self.interfaces:
            # a device may be both (e.g. the GUI Renderer renders snapshots
            # out and feeds widget events in) — one thread per side, like
            # the reference's input/output/GUI SimInterfaces (sim.jl:100-166)
            fns = []
            if isinstance(iface.device, InputDevice):
                fns.append(self._input_thread)
            if isinstance(iface.device, OutputDevice):
                fns.append(self._output_thread)
            for fn in fns:
                th = threading.Thread(target=fn, args=(iface,), daemon=True)
                th.start()
                threads.append(th)

        t_wall0 = time.monotonic()
        # native pacer if available: releases the GIL while sleeping and
        # lands within ~10 us of the deadline (Python busy-wait burns the
        # core; time.sleep jitters by milliseconds)
        pacer, t_ns0 = None, 0
        try:
            from flightjax.io import native
            if native.available():
                pacer, t_ns0 = native.pace_until, native.now_ns()
        except Exception:
            pacer = None
        dt = self.sim.dt
        try:
            while float(self.state.t) < t_end and not ctl.abort:
                if ctl.paused:
                    time.sleep(0.05)
                    continue
                with ctl.lock:
                    self.state = self._step(self.state)
                    ctl.iter += 1
                    ctl.t_sim = float(self.state.t)
                ctl.t_wall = time.monotonic() - t_wall0
                if pace != float("inf"):
                    target = ctl.t_sim / pace
                    if pacer is not None:  # native: sleep+spin, us-accurate
                        pacer(t_ns0 + int(target * 1e9))
                    else:
                        while time.monotonic() - t_wall0 < target:
                            pass  # busy-wait (`sim.jl:548-553`)
        finally:
            ctl.abort = True
            for iface in self.interfaces:
                iface.device.interrupt()
            for th in threads:
                th.join(timeout=1.0)
            for iface in self.interfaces:
                iface.device.shutdown()
        return self.state
