"""Import the reference implementation (read-only, /root/reference) as a
numerical oracle for parity tests.

The reference package pulls in `gym` and `skimage` at import time, neither of
which exists in this image, so minimal stand-ins are registered first.  The
stand-ins implement just enough behavior for the modules under test; nothing
from the reference is executed outside the test suite.
"""
import os
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
_loaded = False


def _install_gym_stub():
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")
    envs = types.ModuleType("gym.envs")
    registration = types.ModuleType("gym.envs.registration")
    registration.register = lambda **kwargs: None
    spaces = types.ModuleType("gym.spaces")

    class _Box:
        def __init__(self, low=None, high=None, shape=None, dtype=None):
            self.low = np.asarray(low)
            self.high = np.asarray(high)
            self.shape = self.low.shape if shape is None else shape
            self.dtype = dtype

    spaces.Box = _Box

    class _Env:
        pass

    gym.Env = _Env
    gym.spaces = spaces
    gym.envs = envs
    envs.registration = registration
    utils = types.ModuleType("gym.utils")
    seeding = types.ModuleType("gym.utils.seeding")

    def _np_random(seed=None):
        return np.random.RandomState(seed), seed

    seeding.np_random = _np_random
    utils.seeding = seeding
    gym.utils = utils
    sys.modules["gym"] = gym
    sys.modules["gym.envs"] = envs
    sys.modules["gym.envs.registration"] = registration
    sys.modules["gym.spaces"] = spaces
    sys.modules["gym.utils"] = utils
    sys.modules["gym.utils.seeding"] = seeding


def _install_skimage_stub():
    if "skimage" in sys.modules:
        return

    def block_reduce(image, block_size, func=np.max, cval=0.0):
        """Functional equivalent of skimage.measure.block_reduce for 2-D."""
        if np.isscalar(block_size):
            block_size = (block_size,) * image.ndim
        pads = []
        for dim, bs in zip(image.shape, block_size):
            rem = dim % bs
            pads.append((0, 0 if rem == 0 else bs - rem))
        padded = np.pad(image, pads, mode="constant", constant_values=cval)
        h, w = padded.shape
        bh, bw = block_size
        view = padded.reshape(h // bh, bh, w // bw, bw)
        return func(func(view, axis=3), axis=1)

    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.block_reduce = block_reduce
    skimage.measure = measure
    sys.modules["skimage"] = skimage
    sys.modules["skimage.measure"] = measure


def _install_grid_current_stub():
    """The reference's genenate_current.py unpickles current.pkl at import
    time; the pickle is not shipped.  Provide the generator's math in closed
    form (validated against genenate_current.py:38-55 semantics in
    tests/test_world.py) so reference env modules that import it still run.
    """
    name = "gym_dockauv.objects.genenate_current"
    if name in sys.modules:
        return
    n = 200
    lon = np.linspace(-20.0, 20.0, n)
    val = np.linspace(-10.0, 10.0, n)

    def generate_current(input_y, input_x, input_z, t):
        ind_x = int(np.sum(input_x >= lon) - 1)
        ind_y = int(np.sum(input_y >= lon) - 1)
        ind_z = int(np.sum(input_z >= lon) - 1)
        i, j, k = ind_x % n, ind_y % n, ind_z % n
        xv, yv = val[j], val[i]
        distance = abs(yv - 0.25 * (xv + 4) * (xv - 4))
        direction = np.array([1.0, xv])
        direction = direction / np.linalg.norm(direction)
        magnitude = min((0.5 + k / n) * np.exp(-distance) + 0.3, 1.0)
        return np.array([magnitude * direction[0], magnitude * direction[1], 0.0])

    mod = types.ModuleType(name)
    mod.generate_current = generate_current
    sys.modules[name] = mod


def load_reference():
    """Put /root/reference on sys.path with stubs installed; idempotent."""
    global _loaded
    if _loaded:
        return
    _install_gym_stub()
    _install_skimage_stub()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_grid_current_stub()
    # tqdm is only needed by the vendored SB3; not required for object layer.
    _loaded = True
    return
