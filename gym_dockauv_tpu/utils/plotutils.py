"""Rendering, post-hoc plots and animation export.

Role of gym_dockauv/utils/plotutils.py:30-624: `EpisodeAnimation` draws the
live 3-D path + heading quiver + radar rays + obstacle meshes with blitting;
`EpisodeVisualization` renders post-hoc state/observation/input/reward plots
and trajectory replays from a pickled `EpisodeDataStorage`; video export
uses ffmpeg when present, else the pillow writer (.gif).  NED convention:
z is down, so the 3-D axes plot -z and the box aspect mirrors the
reference's flipped layout (plotutils.py:391, :490).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import matplotlib
import numpy as np

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.animation as manimation  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from .blitmanager import BlitManager  # noqa: E402


# -- shape meshes (shape.py:41-166 role) -------------------------------------
def sphere_mesh(center, radius, n=20):
    u = np.linspace(0, 2 * np.pi, n)
    v = np.linspace(0, np.pi, n)
    x = center[0] + radius * np.outer(np.cos(u), np.sin(v))
    y = center[1] + radius * np.outer(np.sin(u), np.sin(v))
    z = center[2] + radius * np.outer(np.ones_like(u), np.cos(v))
    return x, y, z


def capsule_mesh(vec_bot, vec_top, radius, n=16):
    """Cylinder body along the (z-aligned) axis + hemispherical caps."""
    vec_bot, vec_top = np.asarray(vec_bot), np.asarray(vec_top)
    center = (vec_bot + vec_top) / 2
    h = np.linalg.norm(vec_top - vec_bot)
    theta = np.linspace(0, 2 * np.pi, n)
    zc = np.linspace(-h / 2, h / 2, 2)
    th, zz = np.meshgrid(theta, zc)
    x = center[0] + radius * np.cos(th)
    y = center[1] + radius * np.sin(th)
    z = center[2] + zz
    meshes = [(x, y, z)]
    for zend, sign in ((center[2] - h / 2, -1), (center[2] + h / 2, 1)):
        u = np.linspace(0, 2 * np.pi, n)
        v = np.linspace(0, np.pi / 2, n)
        xs = center[0] + radius * np.outer(np.cos(u), np.sin(v))
        ys = center[1] + radius * np.outer(np.sin(u), np.sin(v))
        zs = zend + sign * radius * np.outer(np.ones_like(u), np.cos(v))
        meshes.append((xs, ys, zs))
    return meshes


def _draw_shapes(ax, shapes: Sequence[dict]):
    for s in shapes or []:
        if s["type"] == "sphere":
            x, y, z = sphere_mesh(s["position"], s["radius"])
            ax.plot_surface(x, y, -z, color="tab:red", alpha=0.3)
        elif s["type"] == "capsule":
            for x, y, z in capsule_mesh(s["vec_bot"], s["vec_top"], s["radius"]):
                ax.plot_surface(x, y, -z, color="tab:orange", alpha=0.3)


# -- live animation (plotutils.py:342-571 role) -------------------------------
class EpisodeAnimation:
    def __init__(self):
        self.fig = plt.figure(figsize=(7, 7))
        self.ax: Optional[plt.Axes] = None
        self.bm: Optional[BlitManager] = None
        self.episode_text = None

    def init_path_animation(self, shapes=None, goal=None, max_dist=20.0,
                            title: str = ""):
        self.ax = self.fig.add_subplot(projection="3d", proj_type="ortho")
        ax = self.ax
        ax.set_xlabel("x (N)")
        ax.set_ylabel("y (E)")
        ax.set_zlabel("-z (up)")
        ax.set_title(title)
        r = max_dist
        ax.set_xlim(-r, r)
        ax.set_ylim(-r, r)
        ax.set_zlim(-r, r)
        # NED-style mirrored box aspect (reference plotutils.py:490)
        ax.set_box_aspect((1, 1, 1))
        _draw_shapes(ax, shapes)
        if goal is not None:
            x, y, z = sphere_mesh(np.asarray(goal), 0.5, n=10)
            ax.plot_surface(x, y, -z, color="tab:green", alpha=0.5)
        (self.path_line,) = ax.plot([], [], [], "b-", lw=1, animated=True)
        (self.pos_dot,) = ax.plot([], [], [], "bo", ms=5, animated=True)
        self.heading = ax.quiver(0, 0, 0, 1, 0, 0, length=2, color="k",
                                 animated=True)
        self.ray_lines = None
        self.bm = BlitManager(self.fig.canvas,
                              [self.path_line, self.pos_dot, self.heading])
        # initial full draw: computes the 3-D projection matrix the blit
        # path needs before the first animated-artist draw
        self.fig.canvas.draw()
        return self.ax

    def add_episode_text(self, episode: int):
        self.episode_text = self.ax.text2D(
            0.02, 0.95, f"Episode {episode}", transform=self.ax.transAxes,
            animated=True)
        self.bm.add_artist(self.episode_text)

    def init_radar_animation(self, n_rays: int):
        self.ray_lines = []
        for _ in range(n_rays):
            (ln,) = self.ax.plot([], [], [], "-", color="tab:purple",
                                 lw=0.4, alpha=0.5, animated=True)
            self.ray_lines.append(ln)
            self.bm.add_artist(ln)

    def update_path_animation(self, positions: np.ndarray,
                              attitudes: np.ndarray,
                              radar_pos: Optional[np.ndarray] = None,
                              radar_end_pos: Optional[np.ndarray] = None,
                              rotate_cam: bool = False, azim_step: float = 0.5):
        p = np.asarray(positions)
        self.path_line.set_data(p[:, 0], p[:, 1])
        self.path_line.set_3d_properties(-p[:, 2])
        self.pos_dot.set_data(p[-1:, 0], p[-1:, 1])
        self.pos_dot.set_3d_properties(-p[-1:, 2])
        att = np.asarray(attitudes)[-1]
        direction = np.array([np.cos(att[2]) * np.cos(att[1]),
                              np.sin(att[2]) * np.cos(att[1]),
                              np.sin(att[1])])
        self.heading.remove()
        self.heading = self.ax.quiver(
            p[-1, 0], p[-1, 1], -p[-1, 2], direction[0], direction[1],
            direction[2], length=2, color="k", animated=True)
        self.bm._artists[2] = self.heading
        if radar_end_pos is not None:
            if self.ray_lines is None:
                self.init_radar_animation(len(radar_end_pos))
            o = np.asarray(radar_pos)
            for ln, e in zip(self.ray_lines, np.asarray(radar_end_pos)):
                ln.set_data([o[0], e[0]], [o[1], e[1]])
                ln.set_3d_properties([-o[2], -e[2]])
        if rotate_cam:
            self.ax.azim = (self.ax.azim + azim_step) % 360
            self.bm._bg = None  # camera moved: force full redraw
        self.bm.update()

    def save_animation(self, positions, attitudes, save_path: str,
                       radar_pos=None, radar_end_pos=None, fps: int = 10):
        """Export the trajectory replay as video: ffmpeg (mp4) when
        available, else pillow (.gif) (reference plotutils.py:540-571)."""
        n = len(positions)

        def frame(i):
            self.update_path_animation(
                positions[: i + 1], attitudes[: i + 1],
                None if radar_pos is None else radar_pos[i],
                None if radar_end_pos is None else radar_end_pos[i])
            return []

        anim = manimation.FuncAnimation(self.fig, frame, frames=n, blit=False)
        if manimation.writers.is_available("ffmpeg"):
            if not save_path.endswith(".mp4"):
                save_path += ".mp4"
            anim.save(save_path, writer=manimation.FFMpegWriter(fps=fps))
        else:
            if not save_path.endswith(".gif"):
                save_path = os.path.splitext(save_path)[0] + ".gif"
            anim.save(save_path, writer=manimation.PillowWriter(fps=fps))
        return save_path

    def close(self):
        plt.close(self.fig)


# -- post-hoc visualization (plotutils.py:30-339 role) ------------------------
class EpisodeVisualization:
    def __init__(self, storage):
        from .datastorage import EpisodeDataStorage

        if isinstance(storage, str):
            storage = EpisodeDataStorage.load(storage)
        self.st = storage

    def plot_episode_states(self, show: bool = False, save_path: Optional[str] = None):
        s = self.st.states
        t = np.arange(len(s)) * self.st.step_size
        fig, axes = plt.subplots(3, 2, figsize=(11, 9))
        panels = [
            (s[:, 0:3], ["x", "y", "z"], "position [m]"),
            (np.degrees(s[:, 3:6]), ["phi", "theta", "psi"], "attitude [deg]"),
            (s[:, 6:9], ["u", "v", "w"], "lin. velocity [m/s]"),
            (np.degrees(s[:, 9:12]), ["p", "q", "r"], "ang. rate [deg/s]"),
            (np.linalg.norm(s[:, 6:9], axis=1, keepdims=True), ["|v|"], "speed [m/s]"),
            (self.st.nu_c[:, 0:3], ["u_c", "v_c", "w_c"], "current [m/s]"),
        ]
        for ax, (data, labels, title) in zip(axes.flat, panels):
            for i, lab in enumerate(labels):
                ax.plot(t[: len(data)], data[:, i], label=lab)
            ax.set_title(title)
            ax.legend(fontsize=7)
            ax.grid(alpha=0.3)
        fig.tight_layout()
        return self._finish(fig, show, save_path)

    def plot_episode_observations(self, show: bool = False,
                                  save_path: Optional[str] = None):
        obs = self.st.observations
        meta = self.st.storage["meta_data_observation"]
        t = np.arange(len(obs)) * self.st.step_size
        fig, axes = plt.subplots(2, 3, figsize=(12, 7))
        i = 0
        for ax, group in zip(axes.flat, meta):
            for name in group:
                ax.plot(t, obs[:, i], label=name, lw=0.8)
                i += 1
            ax.legend(fontsize=6, ncol=2)
            ax.grid(alpha=0.3)
        fig.tight_layout()
        return self._finish(fig, show, save_path)

    def plot_u(self, show: bool = False, save_path: Optional[str] = None):
        u = self.st.u
        t = np.arange(len(u)) * self.st.step_size
        fig, ax = plt.subplots(figsize=(9, 4))
        for i in range(u.shape[1]):
            ax.plot(t, u[:, i], label=f"u_{i}")
        ax.set_xlabel("t [s]")
        ax.set_ylabel("input")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        return self._finish(fig, show, save_path)

    def plot_rewards(self, show: bool = False, save_path: Optional[str] = None):
        r = self.st.rewards
        cum = self.st.cum_rewards
        meta = self.st.storage["meta_data_reward"]
        t = np.arange(len(r)) * self.st.step_size
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
        for i, name in enumerate(meta[:8]):
            ax1.plot(t, r[:, i], label=name, lw=0.8)
        ax1.set_title("continuous step rewards")
        ax1.legend(fontsize=6)
        ax1.grid(alpha=0.3)
        for i, name in enumerate(meta):
            ax2.plot(t, cum[:, i], label=name, lw=0.8)
        ax2.plot(t, cum.sum(axis=1), "k--", label="total", lw=1.2)
        ax2.set_title("cumulative rewards")
        ax2.legend(fontsize=6)
        ax2.grid(alpha=0.3)
        fig.tight_layout()
        return self._finish(fig, show, save_path)

    def plot_episode_animation(self, show: bool = False,
                               save_path: Optional[str] = None, fps: int = 10):
        anim = EpisodeAnimation()
        anim.init_path_animation(
            shapes=self.st.storage.get("shapes"),
            goal=self.st.storage.get("goal_location"),
            title=self.st.storage.get("title", ""))
        anim.add_episode_text(self.st.storage.get("episode", 0))
        # _get falls back to the live capture arrays for unsaved storages
        try:
            radar_pos = self.st._get("radar_pos")
            radar_end = self.st._get("radar_end_pos")
        except KeyError:
            radar_pos = radar_end = None
        if save_path:
            out = anim.save_animation(self.st.positions, self.st.attitudes,
                                      save_path, radar_pos, radar_end, fps)
            anim.close()
            return out
        for i in range(len(self.st.positions)):
            anim.update_path_animation(
                self.st.positions[: i + 1], self.st.attitudes[: i + 1],
                None if radar_pos is None else radar_pos[i],
                None if radar_end is None else radar_end[i])
        if not show:
            anim.close()
        return anim

    def _finish(self, fig, show, save_path):
        if save_path:
            fig.savefig(save_path, dpi=110)
        if show:
            plt.show()
        else:
            plt.close(fig)
        return save_path or fig


def plot_full_rewards(full_storage, show: bool = False,
                      save_path: Optional[str] = None):
    """FullDataStorage.plot_rewards role (datastorage.py:106-118)."""
    cum = full_storage.cum_rewards.get_data()
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.plot(cum.sum(axis=1), lw=0.8, label="episode return")
    if len(cum) >= 10:
        k = max(len(cum) // 50, 5)
        smooth = np.convolve(cum.sum(axis=1), np.ones(k) / k, mode="valid")
        ax.plot(np.arange(len(smooth)) + k - 1, smooth, "r-",
                label=f"moving avg ({k})")
    ax.set_xlabel("episode")
    ax.set_ylabel("cumulative reward")
    ax.legend()
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return save_path or fig


# -- reward landscape debug helpers (plotutils.py:574-624) ---------------------
def plot_function2d(f, xlim, n=200, show=False, save_path=None, label="f"):
    x = np.linspace(*xlim, n)
    try:  # vectorized evaluation (jnp-based reward fns broadcast fine)
        y = np.asarray(f(x), dtype=float)
        assert y.shape == x.shape
    except Exception:
        y = np.asarray([float(f(xi)) for xi in x])
    fig, ax = plt.subplots()
    ax.plot(x, y)
    ax.set_xlabel("x")
    ax.set_ylabel(label)
    ax.grid(alpha=0.3)
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return save_path or fig


def plot_function3d(f, xlim, ylim, n=60, show=False, save_path=None, label="f"):
    x = np.linspace(*xlim, n)
    y = np.linspace(*ylim, n)
    xx, yy = np.meshgrid(x, y)
    try:  # one batched call instead of n*n scalar dispatches
        zz = np.asarray(f(xx, yy), dtype=float)
        assert zz.shape == xx.shape
    except Exception:
        zz = np.asarray([[float(f(xi, yi)) for xi in x] for yi in y])
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.plot_surface(xx, yy, zz, cmap="viridis")
    ax.set_zlabel(label)
    if save_path:
        fig.savefig(save_path, dpi=110)
    if show:
        plt.show()
    else:
        plt.close(fig)
    return save_path or fig


# -- live env render (docking3d.py:645-679 role) --------------------------------
def render_env(env, rotate_cam: bool = False, real_time: bool = False):
    """Lazily attach an EpisodeAnimation to a GymDockingEnv and draw the
    trajectory so far.  Called from GymDockingEnv.render."""
    import jax

    if env.episode_animation is None or not hasattr(env, "_render_traj"):
        env.episode_animation = EpisodeAnimation()
        st = env.state
        from .datastorage import _shapes_from_state

        env.episode_animation.init_path_animation(
            shapes=_shapes_from_state(st),
            goal=np.asarray(st.goal),
            max_dist=env.config.max_dist_from_goal,
            title=env.env_id or "")
        env.episode_animation.add_episode_text(int(st.episode))
        env._render_traj = []
        if getattr(env, "_radar_fn", None) is None:  # shared compile cache
            env._radar_fn = jax.jit(env.core.radar_snapshot)
    st = env.state
    env._render_traj.append(
        (np.asarray(st.vehicle[0:3]), np.asarray(st.vehicle[3:6])))
    pos, end = env._radar_fn(st)
    positions = np.stack([p for p, _ in env._render_traj])
    attitudes = np.stack([a for _, a in env._render_traj])
    env.episode_animation.update_path_animation(
        positions, attitudes, np.asarray(pos), np.asarray(end),
        rotate_cam=rotate_cam)
    if real_time:
        plt.pause(max(env.config.t_step_size, 0.001))
    return env.episode_animation
