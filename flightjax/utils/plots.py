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
