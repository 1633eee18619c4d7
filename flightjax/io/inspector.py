"""Generic model inspector: auto-generated dashboard over any output
pytree — the functional analog of the reference's universal `GUI.draw!`
fallback that gives every model a live inspection window (`gui.jl:243-246`)
and of the per-model debug panels (e.g. the control-law windows,
`c172x_ctl.jl:715-726`), with ZERO per-model code:

- dict / NamedTuple nodes -> collapsible sections (top level open),
- float scalars -> sparkline over a rolling history + live value,
- small vectors (<= `max_vector`) -> one sparkline per component,
- bools / ints -> text lines (mode/FSM states),
- large arrays -> a shape + min/mean/max summary line.

Usage (exactly the `Renderer(f_draw=...)` protocol):

    insp = Inspector()
    renderer = Renderer(f_draw=insp)
    loop.attach(renderer, InspectorMapping(), period=0.1)

`InspectorMapping.extract_output` hands the raw `(snapshot, y)` pair to the
renderer; the Inspector walks `y` (plus `t`) each frame and keeps per-leaf
history for the sparklines. No SDL/GL: works on the stdlib web renderer.
"""

from collections import deque

import numpy as np

from flightjax.io import gui
from flightjax.io.devices import IOMapping


def _children(node):
    """(name, child) pairs for dict / NamedTuple nodes, else None."""
    if isinstance(node, dict):
        return list(node.items())
    if hasattr(node, "_fields"):  # NamedTuple
        return [(k, getattr(node, k)) for k in node._fields]
    return None


class Inspector:
    """Stateful draw function: call with `(snapshot, y)`, a bare `y`, or a
    dict; returns a widget frame. Keeps `history` samples per scalar leaf
    for the sparklines."""

    def __init__(self, history=256, max_vector=8, title="inspector"):
        self.history = int(history)
        self.max_vector = int(max_vector)
        self.title = title
        self._hist = {}

    # ---------------------------------------------------------------- leaves

    def _series(self, path, value):
        h = self._hist.get(path)
        if h is None:
            h = self._hist[path] = deque(maxlen=self.history)
        h.append(float(value))
        return h

    def _leaf_widgets(self, name, path, leaf):
        a = np.asarray(leaf)
        if a.dtype == bool:
            return [gui.text(f"{name}: {bool(a)}")] if a.ndim == 0 else \
                [gui.text(f"{name}: {a.tolist()}")]
        if np.issubdtype(a.dtype, np.integer):
            return [gui.text(f"{name}: {a.tolist() if a.ndim else int(a)}")]
        if a.ndim == 0:
            return [gui.sparkline(name, self._series(path, a))]
        if a.ndim == 1 and a.size <= self.max_vector:
            return [gui.sparkline(f"{name}[{i}]",
                                  self._series(f"{path}[{i}]", a[i]))
                    for i in range(a.size)]
        if a.size == 0:
            return []
        return [gui.text(
            f"{name}: shape {a.shape}  min {a.min():.4g}  "
            f"mean {a.mean():.4g}  max {a.max():.4g}")]

    # ----------------------------------------------------------------- walk

    def _walk(self, name, path, node, depth):
        kids = _children(node)
        if kids is None:
            if node is None:
                return []
            return self._leaf_widgets(name, path, node)
        inner = []
        for k, v in kids:
            inner += self._walk(str(k), f"{path}.{k}", v, depth + 1)
        if not inner:
            return []
        return [gui.section(name, inner, open=depth == 0, id=path)]

    def frame(self, y, t=None):
        widgets = []
        if t is not None:
            widgets.append(gui.text(f"{self.title}  t = {float(t):10.3f} s"))
        kids = _children(y)
        if kids is None:
            widgets += self._walk("y", "y", y, 0)
        else:
            for k, v in kids:
                widgets += self._walk(str(k), f".{k}", v, 0)
        return widgets

    def __call__(self, data):
        """`f_draw` protocol: accepts (snapshot, y), a bare y pytree, or an
        already-built widget frame (passed through)."""
        if (isinstance(data, tuple) and len(data) == 2
                and hasattr(data[0], "t")):
            snapshot, y = data
            return self.frame(y, t=snapshot.t)
        if (isinstance(data, (list, tuple)) and data
                and all(isinstance(w, dict) and "kind" in w for w in data)):
            return list(data)  # already a widget frame
        return self.frame(data)


class InspectorMapping(IOMapping):
    """Attach a Renderer(f_draw=Inspector()) to any model: hands the raw
    (snapshot, y) pair through; the Inspector builds the frame."""

    def extract_output(self, snapshot, y):
        return (snapshot, y)
