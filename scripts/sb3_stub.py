"""A runtime-complete `gym` 0.21-style stub for driving the VENDORED
reference SB3 1.5.0 (/root/reference/stable_baselines3) on CPU.

The image ships no `gym`; tests/reference_oracle.py installs a minimal
import-time stub sufficient for the object layer, but actually TRAINING
with the vendored SB3 needs the runtime surface too: space sampling and
seeding, Env/Wrapper semantics, and the wrappers.monitoring module that
vec_video_recorder imports.  Install THIS stub before load_reference() —
the oracle's installer is a no-op when `gym` is already present.

Only the API the vendored SB3 actually touches (grep over its sources:
spaces.{Space,Box,Dict,Discrete,Tuple,MultiDiscrete,MultiBinary}, Env,
Wrapper, ObservationWrapper, RewardWrapper, GoalEnv, __version__,
wrappers.monitoring.video_recorder) is implemented.
"""
from __future__ import annotations

import sys
import types

import numpy as np


class Space:
    def __init__(self, shape=None, dtype=None):
        self.shape = shape
        self.dtype = dtype
        self._np_random = np.random.RandomState()

    def seed(self, seed=None):
        self._np_random = np.random.RandomState(seed)
        return [seed]

    def sample(self):
        raise NotImplementedError

    def contains(self, x):
        return True


class Box(Space):
    def __init__(self, low=None, high=None, shape=None, dtype=np.float32):
        low = np.asarray(low, dtype=np.float64)
        high = np.asarray(high, dtype=np.float64)
        if shape is None:
            shape = np.broadcast(low, high).shape
        self.low = np.broadcast_to(low, shape).astype(dtype)
        self.high = np.broadcast_to(high, shape).astype(dtype)
        super().__init__(tuple(shape), np.dtype(dtype))
        self.bounded_below = np.isfinite(self.low)
        self.bounded_above = np.isfinite(self.high)

    def sample(self):
        return self._np_random.uniform(self.low, self.high,
                                       self.shape).astype(self.dtype)

    def contains(self, x):
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low - 1e-6) and np.all(x <= self.high + 1e-6))

    def is_bounded(self, manner="both"):
        below, above = self.bounded_below.all(), self.bounded_above.all()
        return {"both": below and above, "below": below,
                "above": above}[manner]

    def __repr__(self):
        return f"Box{self.shape}"


class Discrete(Space):
    def __init__(self, n):
        super().__init__((), np.dtype(np.int64))
        self.n = n

    def sample(self):
        return int(self._np_random.randint(self.n))

    def contains(self, x):
        return 0 <= int(x) < self.n


class MultiDiscrete(Space):
    def __init__(self, nvec):
        self.nvec = np.asarray(nvec, dtype=np.int64)
        super().__init__(self.nvec.shape, np.dtype(np.int64))

    def sample(self):
        return (self._np_random.random_sample(self.nvec.shape)
                * self.nvec).astype(np.int64)


class MultiBinary(Space):
    def __init__(self, n):
        self.n = n
        super().__init__((n,), np.dtype(np.int8))

    def sample(self):
        return self._np_random.randint(2, size=self.n).astype(np.int8)


class DictSpace(Space):
    def __init__(self, spaces=None, **kwargs):
        self.spaces = dict(spaces or {}, **kwargs)
        super().__init__(None, None)

    def sample(self):
        return {k: s.sample() for k, s in self.spaces.items()}

    def __getitem__(self, k):
        return self.spaces[k]

    def items(self):
        return self.spaces.items()


class TupleSpace(Space):
    def __init__(self, spaces):
        self.spaces = tuple(spaces)
        super().__init__(None, None)

    def sample(self):
        return tuple(s.sample() for s in self.spaces)


class Env:
    metadata = {"render.modes": []}
    reward_range = (-float("inf"), float("inf"))
    spec = None
    action_space = None
    observation_space = None

    def reset(self, **kwargs):
        raise NotImplementedError

    def step(self, action):
        raise NotImplementedError

    def render(self, mode="human"):
        pass

    def close(self):
        pass

    def seed(self, seed=None):
        # gym 0.21 semantics; the reference env samples scenarios from the
        # GLOBAL numpy RNG (SURVEY.md), so seed that too
        np.random.seed(seed)
        if self.action_space is not None:
            self.action_space.seed(seed)
        return [seed]

    @property
    def unwrapped(self):
        return self


class GoalEnv(Env):
    pass


class Wrapper(Env):
    def __init__(self, env):
        self.env = env
        self.action_space = env.action_space
        self.observation_space = env.observation_space
        self.metadata = getattr(env, "metadata", Env.metadata)

    def step(self, action):
        return self.env.step(action)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def render(self, mode="human", **kwargs):
        return self.env.render(mode, **kwargs)

    def close(self):
        return self.env.close()

    def seed(self, seed=None):
        return self.env.seed(seed)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.env, name)

    @property
    def unwrapped(self):
        return self.env.unwrapped


class ObservationWrapper(Wrapper):
    def observation(self, observation):
        raise NotImplementedError

    def reset(self, **kwargs):
        return self.observation(self.env.reset(**kwargs))

    def step(self, action):
        obs, r, d, i = self.env.step(action)
        return self.observation(obs), r, d, i


class RewardWrapper(Wrapper):
    def reward(self, reward):
        raise NotImplementedError

    def step(self, action):
        obs, r, d, i = self.env.step(action)
        return obs, self.reward(r), d, i


def install():
    """Register the stub as `gym` (idempotent; must run before any import
    of the vendored SB3 or tests.reference_oracle.load_reference)."""
    if "gym" in sys.modules and getattr(sys.modules["gym"], "_SB3_STUB", 0):
        return sys.modules["gym"]
    gym = types.ModuleType("gym")
    gym._SB3_STUB = 1
    gym.__version__ = "0.21.0"
    gym.Space = Space
    gym.Env = Env
    gym.GoalEnv = GoalEnv
    gym.Wrapper = Wrapper
    gym.ObservationWrapper = ObservationWrapper
    gym.RewardWrapper = RewardWrapper

    spaces = types.ModuleType("gym.spaces")
    spaces.Space = Space
    spaces.Box = Box
    spaces.Discrete = Discrete
    spaces.MultiDiscrete = MultiDiscrete
    spaces.MultiBinary = MultiBinary
    spaces.Dict = DictSpace
    spaces.Tuple = TupleSpace

    space_utils = types.ModuleType("gym.spaces.utils")

    def flatdim(space):
        import numpy as _np

        if isinstance(space, Box):
            return int(_np.prod(space.shape))
        if isinstance(space, Discrete):
            return space.n
        if isinstance(space, (MultiDiscrete, MultiBinary)):
            return int(_np.prod(space.shape))
        if isinstance(space, DictSpace):
            return sum(flatdim(s) for s in space.spaces.values())
        if isinstance(space, TupleSpace):
            return sum(flatdim(s) for s in space.spaces)
        raise NotImplementedError(type(space))

    space_utils.flatdim = flatdim
    spaces.utils = space_utils
    gym.spaces = spaces

    def _make(*a, **k):
        raise NotImplementedError("gym.make is not available in the stub; "
                                  "instantiate the reference env directly")

    gym.make = _make

    envs = types.ModuleType("gym.envs")
    registration = types.ModuleType("gym.envs.registration")
    registration.register = lambda **kwargs: None
    envs.registration = registration
    gym.envs = envs

    utils = types.ModuleType("gym.utils")
    seeding = types.ModuleType("gym.utils.seeding")
    seeding.np_random = lambda seed=None: (np.random.RandomState(seed), seed)
    utils.seeding = seeding
    gym.utils = utils

    wrappers = types.ModuleType("gym.wrappers")
    monitoring = types.ModuleType("gym.wrappers.monitoring")
    video_recorder = types.ModuleType(
        "gym.wrappers.monitoring.video_recorder")

    class VideoRecorder:  # never exercised (no rendering in this image)
        def __init__(self, *a, **k):
            self.path = None

        def capture_frame(self):
            pass

        def close(self):
            pass

    video_recorder.VideoRecorder = VideoRecorder
    monitoring.video_recorder = video_recorder
    wrappers.monitoring = monitoring
    gym.wrappers = wrappers

    mods = {"gym": gym, "gym.spaces": spaces,
            "gym.spaces.utils": spaces.utils, "gym.envs": envs,
            "gym.envs.registration": registration, "gym.utils": utils,
            "gym.utils.seeding": seeding, "gym.wrappers": wrappers,
            "gym.wrappers.monitoring": monitoring,
            "gym.wrappers.monitoring.video_recorder": video_recorder}
    sys.modules.update(mods)
    return gym
