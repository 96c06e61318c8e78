"""Training callbacks.

Role of stable_baselines3/common/callbacks.py:602 (BaseCallback tree,
CheckpointCallback, EvalCallback, StopTrainingOnRewardThreshold,
CallbackList).  Cadence note: callbacks fire once per *learn iteration*
(the jitted collect+train program), not per env step — `num_timesteps`
advances by `_steps_per_iteration` between calls.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


class BaseCallback:
    def __init__(self, verbose: int = 0):
        self.verbose = verbose
        self.model = None
        self.n_calls = 0

    def init_callback(self, model) -> None:
        self.model = model
        self._init_callback()

    def _init_callback(self) -> None:
        pass

    def on_step(self, model=None) -> bool:
        self.model = model or self.model
        self.n_calls += 1
        return self._on_step()

    def _on_step(self) -> bool:
        return True


class CallbackList(BaseCallback):
    def __init__(self, callbacks: List[BaseCallback]):
        super().__init__()
        self.callbacks = callbacks

    def _init_callback(self) -> None:
        for cb in self.callbacks:
            cb.init_callback(self.model)

    def _on_step(self) -> bool:
        return all(cb.on_step(self.model) for cb in self.callbacks)


class CheckpointCallback(BaseCallback):
    """Save the model every save_freq env steps (callbacks.py:318-352)."""

    def __init__(self, save_freq: int, save_path: str,
                 name_prefix: str = "rl_model", verbose: int = 0):
        super().__init__(verbose)
        self.save_freq = save_freq
        self.save_path = save_path
        self.name_prefix = name_prefix
        self._last_save = 0

    def _init_callback(self) -> None:
        os.makedirs(self.save_path, exist_ok=True)

    def _on_step(self) -> bool:
        if self.model.num_timesteps - self._last_save >= self.save_freq:
            self._last_save = self.model.num_timesteps
            path = os.path.join(
                self.save_path,
                f"{self.name_prefix}_{self.model.num_timesteps}_steps")
            self.model.save(path)
            if self.verbose:
                print(f"Saved checkpoint to {path}")
        return True


class EvalCallback(BaseCallback):
    """Periodic deterministic evaluation; tracks/saves the best model
    (callbacks.py:355-500)."""

    def __init__(self, eval_freq: int = 10_000, n_eval_episodes: int = 5,
                 best_model_save_path: Optional[str] = None,
                 callback_on_new_best: Optional[BaseCallback] = None,
                 verbose: int = 0):
        super().__init__(verbose)
        self.eval_freq = eval_freq
        self.n_eval_episodes = n_eval_episodes
        self.best_model_save_path = best_model_save_path
        self.callback_on_new_best = callback_on_new_best
        self.best_mean_reward = -np.inf
        self.last_mean_reward = -np.inf
        self._last_eval = 0

    def _init_callback(self) -> None:
        if self.best_model_save_path:
            os.makedirs(self.best_model_save_path, exist_ok=True)
        if self.callback_on_new_best:
            self.callback_on_new_best.parent = self
            self.callback_on_new_best.init_callback(self.model)

    def _on_step(self) -> bool:
        if self.model.num_timesteps - self._last_eval < self.eval_freq:
            return True
        self._last_eval = self.model.num_timesteps
        from .evaluation import evaluate_policy

        mean_r, std_r = evaluate_policy(
            self.model, n_eval_episodes=self.n_eval_episodes,
            seed=self.n_calls)
        self.last_mean_reward = mean_r
        if self.verbose:
            print(f"Eval at {self.model.num_timesteps}: "
                  f"{mean_r:.1f} +/- {std_r:.1f}")
        self.model.logger.record("eval/mean_reward", mean_r)
        if mean_r > self.best_mean_reward:
            self.best_mean_reward = mean_r
            if self.best_model_save_path:
                self.model.save(os.path.join(self.best_model_save_path,
                                             "best_model"))
            if self.callback_on_new_best:
                return self.callback_on_new_best.on_step(self.model)
        return True


class StopTrainingOnRewardThreshold(BaseCallback):
    """Stop once the eval mean reward crosses the threshold
    (callbacks.py:503-530); pass as EvalCallback(callback_on_new_best=...)."""

    parent: Optional[EvalCallback] = None

    def __init__(self, reward_threshold: float, verbose: int = 0):
        super().__init__(verbose)
        self.reward_threshold = reward_threshold

    def _on_step(self) -> bool:
        assert self.parent is not None, "must be used with EvalCallback"
        stop = self.parent.best_mean_reward >= self.reward_threshold
        if stop and self.verbose:
            print(f"Stopping: reward {self.parent.best_mean_reward:.1f} >= "
                  f"{self.reward_threshold}")
        return not stop
