"""Analysis / debugging utilities.

Role of gym_dockauv/debug.py:25-270: reward-landscape plots, training-curve
and success/collision statistics aggregated over FULL_DATA_STORAGE pickles,
and trajectory path plots over stored episodes.
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from .envs.core import log_precision
from .utils.datastorage import EpisodeDataStorage, FullDataStorage


def plot_reward_landscape(save_dir: str = ".", show: bool = False):
    """Reward-shape plots (debug.py:25-161): the log-precision distance term
    and the quadratic angle penalties."""
    from .utils.plotutils import plot_function2d, plot_function3d

    out = []
    out.append(plot_function2d(
        lambda d: -1.1 * float(log_precision(d, 0.5, 20.0)),
        (0.01, 20.0), show=show,
        save_path=os.path.join(save_dir, "reward_distance.png"),
        label="distance reward"))
    out.append(plot_function3d(
        lambda d, th: -1.1 * float(log_precision(d, 0.5, 20.0))
        - 0.5 * (th / np.pi) ** 2,
        (0.01, 20.0), (-np.pi, np.pi), show=show,
        save_path=os.path.join(save_dir, "reward_dist_heading.png"),
        label="distance+heading reward"))
    return out


def training_statistics(directory: str, window: int = 50):
    """Aggregate FULL_DATA_STORAGE pickles into training curves +
    success/collision rates (debug.py:175-230)."""
    stats = []
    for path in sorted(glob.glob(os.path.join(directory, "**",
                                              "*FULL_DATA_STORAGE*.pkl"),
                                 recursive=True)):
        fds = FullDataStorage.load(path)
        cum = fds.cum_rewards.get_data()
        returns = cum.sum(axis=1)
        infos = fds.infos
        goals = np.array([i.get("goal", i.get("goal_reached", False))
                          for i in infos], dtype=bool) if infos else np.array([])
        cols = np.array([i.get("collision", False) for i in infos],
                        dtype=bool) if infos else np.array([])
        stats.append({
            "file": path,
            "episodes": len(returns),
            "mean_return": float(returns.mean()) if len(returns) else None,
            "final_return": float(returns[-window:].mean()) if len(returns) else None,
            "success_rate": float(goals.mean()) if goals.size else None,
            "collision_rate": float(cols.mean()) if cols.size else None,
            "returns": returns,
        })
    return stats


def plot_training_curves(directory: str, save_path: Optional[str] = None,
                         window: int = 50, show: bool = False):
    import matplotlib.pyplot as plt

    stats = training_statistics(directory, window)
    fig, ax = plt.subplots(figsize=(9, 5))
    for s in stats:
        r = s["returns"]
        if len(r) >= window:
            smooth = np.convolve(r, np.ones(window) / window, mode="valid")
            ax.plot(smooth, label=os.path.basename(os.path.dirname(s["file"])))
    ax.set_xlabel("episode")
    ax.set_ylabel(f"return (moving avg {window})")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return stats


def plot_paths(episode_pickles: List[str], save_path: Optional[str] = None,
               show: bool = False):
    """Overlay stored trajectories in 3-D (debug.py:233-270)."""
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    for path in episode_pickles:
        st = EpisodeDataStorage.load(path)
        p = st.positions
        ax.plot(p[:, 0], p[:, 1], -p[:, 2], lw=0.9)
        goal = st.storage.get("goal_location")
        if goal is not None:
            ax.scatter(goal[0], goal[1], -goal[2], c="g", marker="*", s=60)
    ax.set_xlabel("x (N)")
    ax.set_ylabel("y (E)")
    ax.set_zlabel("-z")
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return save_path or fig
