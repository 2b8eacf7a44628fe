"""Visualization helpers (reference utils/misc.py:101-200).

tensor2im / map2fig / fig2data / plot_grid / grid2fig equivalents for
array inputs (NCHW or NHWC), used by the drivers' qualitative snapshots
and for inspecting the transformation branch's warp grids.
"""

from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt                      # noqa: E402
from matplotlib.collections import LineCollection    # noqa: E402


def tensor2im(array, imtype=np.uint8, normalize: bool = True) -> np.ndarray:
    """Array -> displayable HWC uint8 (reference tensor2im).

    Accepts (B, C, H, W) / (C, H, W) / (H, W); min-max normalizes to
    [0, 255] when `normalize`, else scales by 255.
    """
    if isinstance(array, list):
        return [tensor2im(a, imtype, normalize) for a in array]
    a = np.asarray(array, np.float32)
    if a.ndim == 5:
        a = a[0, -1]
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 2:
        a = a[None]
    a = a[:3]
    if normalize:
        lo, hi = a.min(), a.max()
        a = (a.transpose(1, 2, 0) - lo) / max(hi - lo, 1e-12) * 255.0
    else:
        a = a.transpose(1, 2, 0) * 255.0
    a = np.clip(a, 0, 255)
    if a.shape[2] == 1:
        a = a[:, :, 0]
    return a.astype(imtype)


def fig2data(fig) -> np.ndarray:
    """Matplotlib figure -> (H, W, 4) RGBA uint8."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf.copy()


def map2fig(heatmap: np.ndarray, initial: bool = True) -> np.ndarray:
    """Heatmap -> jet-colormapped RGB image at native resolution."""
    dpi = 1000.0
    heatmap = np.array(heatmap, np.float32, copy=True)
    if initial:
        heatmap[0, 0] = 1.0
    fig = plt.figure(frameon=False)
    fig.set_size_inches(heatmap.shape[1] / dpi, heatmap.shape[0] / dpi)
    ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
    ax.set_axis_off()
    fig.add_axes(ax)
    ax.imshow(heatmap, cmap="jet", aspect="auto")
    fig.set_dpi(int(dpi))
    out = fig2data(fig)[:, :, :3]
    plt.close(fig)
    return out


def plot_grid(x: np.ndarray, y: np.ndarray, ax=None, **kwargs) -> None:
    """Draw a deformable grid as two line collections."""
    ax = ax or plt.gca()
    segs1 = np.stack((x, y), axis=2)
    segs2 = segs1.transpose(1, 0, 2)
    ax.add_collection(LineCollection(segs1, **kwargs))
    ax.add_collection(LineCollection(segs2, **kwargs))
    ax.autoscale()


def grid2fig(warped_grid: np.ndarray, grid_size: int = 32) -> np.ndarray:
    """Visualize a (h, w, 2) flow grid against the identity grid."""
    lin = np.linspace(-1, 1, grid_size)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    fig, ax = plt.subplots()
    plot_grid(gx, gy, ax=ax, color="lightgrey")
    plot_grid(warped_grid[..., 0], warped_grid[..., 1], ax=ax, color="C0")
    plt.axis("off")
    plt.tight_layout(pad=0)
    fig.set_size_inches(256 / 100, 256 / 100)
    fig.set_dpi(100)
    out = fig2data(fig)[:, :, :3]
    plt.close(fig)
    return out
