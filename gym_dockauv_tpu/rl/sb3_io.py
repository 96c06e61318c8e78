"""SB3 1.5.0 checkpoint interop: load reference-trained .zip models.

The reference saves/loads SB3 zip archives (stable_baselines3/common/
save_util.py:1-447: `data` JSON + torch `policy.pth` state_dict +
`pytorch_variables.pth`; base_class.py:680-759 `.load`).  `from_sb3_zip`
maps those torch MlpPolicy state_dicts onto our flax parameter trees so a
policy trained by the reference (or by the vendored SB3 in
scripts/sb3_compare.py) evaluates directly in the TPU env — the one
reference artifact surface that previously had no counterpart here.

Covered policies (all the reference ever trains):
- PPO / A2C  `ActorCriticPolicy` — mlp_extractor.policy_net/value_net +
  action_net/value_net heads + state-independent log_std
- SAC  `SACPolicy` — actor.latent_pi + mu/log_std heads, twin critic,
  critic_target, log_ent_coef (pytorch_variables.pth)
- TD3 / DDPG  `TD3Policy` — actor.mu Sequential (Tanh output), critic(s),
  actor_target/critic_target

torch Linear stores weight as (out, in); flax Dense kernel is (in, out) —
every weight is transposed on the way through.  net_arch is inferred from
the weight shapes, so zips saved with any policy_kwargs load correctly.
"""
from __future__ import annotations

import io
import json
import re
import zipfile
from typing import Dict, Optional

import jax
import numpy as np


def read_sb3_zip(path: str) -> Dict:
    """Parse an SB3 .zip: returns {"data": dict, "policy": state_dict (numpy),
    "pytorch_variables": dict (numpy), "version": str}."""
    import torch  # lazy: only needed to deserialize .pth members

    out: Dict = {"data": {}, "policy": {}, "pytorch_variables": {},
                 "version": None}
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        if "data" in names:
            out["data"] = json.loads(z.read("data").decode("utf-8"))
        if "_stable_baselines3_version" in names:
            out["version"] = z.read(
                "_stable_baselines3_version").decode("utf-8").strip()
        for member, key in (("policy.pth", "policy"),
                            ("pytorch_variables.pth", "pytorch_variables")):
            if member in names:
                sd = torch.load(io.BytesIO(z.read(member)),
                                map_location="cpu")
                out[key] = {k: np.asarray(v.detach().numpy())
                            for k, v in sd.items()
                            if hasattr(v, "detach")}
    return out


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _seq_linears(sd: Dict[str, np.ndarray], prefix: str):
    """Sorted torch Sequential Linear indices under `prefix` (0, 2, 4...)."""
    idxs = sorted({int(m.group(1))
                   for k in sd
                   if (m := re.match(re.escape(prefix) + r"\.(\d+)\.weight$",
                                     k))})
    return idxs


def _mlp_params(sd, prefix, idxs):
    return {f"Dense_{j}": {"kernel": _t(sd[f"{prefix}.{i}.weight"]),
                           "bias": np.asarray(sd[f"{prefix}.{i}.bias"],
                                              np.float32)}
            for j, i in enumerate(idxs)}


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def detect_algo(policy_sd: Dict[str, np.ndarray]) -> str:
    keys = policy_sd.keys()
    if any(k.startswith("mlp_extractor.") for k in keys):
        return "ppo"  # ActorCriticPolicy (PPO or A2C — same tree)
    if any(k.startswith("actor.latent_pi.") for k in keys):
        return "sac"
    if any(k.startswith("actor.mu.") for k in keys):
        return ("td3" if any(k.startswith("critic.qf1.") for k in keys)
                else "ddpg")
    raise ValueError(f"unrecognized SB3 policy state_dict ({sorted(keys)[:4]}...)")


def _check_tree(mapped, template, what):
    """Mapped params must match the freshly-initialized tree exactly —
    catches arch mismatches with a readable error instead of an XLA one."""
    ms = jax.tree_util.tree_structure(mapped)
    ts = jax.tree_util.tree_structure(template)
    if ms != ts:
        raise ValueError(f"{what}: mapped tree {ms} != model tree {ts}")
    for m, t in zip(jax.tree_util.tree_leaves(mapped),
                    jax.tree_util.tree_leaves(template)):
        if np.shape(m) != np.shape(t):
            raise ValueError(f"{what}: shape {np.shape(m)} != {np.shape(t)}")


def from_sb3_zip(path: str, env, algo: str = "auto",
                 n_envs: Optional[int] = None, **hyper):
    """Build one of our models from an SB3 .zip (reference save format).

    `env` — env id string or env object (same surface as the model ctors);
    `algo` — "auto" detects from the state_dict.  Returns a ready model:
    `.predict()` reproduces the SB3 policy's deterministic forward
    (tests/test_sb3_io.py pins this against SB3's own outputs)."""
    from . import A2C, DDPG, PPO, SAC, TD3

    blob = read_sb3_zip(path)
    sd = blob["policy"]
    kind = detect_algo(sd) if algo == "auto" else algo

    if kind in ("ppo", "a2c"):
        idxs = _seq_linears(sd, "mlp_extractor.policy_net")
        net_arch = tuple(sd[f"mlp_extractor.policy_net.{i}.weight"].shape[0]
                         for i in idxs)
        cls = A2C if kind == "a2c" else PPO
        model = cls(env=env, n_envs=n_envs or 1, net_arch=net_arch, **hyper)
        mapped = {"params": {
            "mlp_pi": _mlp_params(sd, "mlp_extractor.policy_net", idxs),
            "mlp_vf": _mlp_params(sd, "mlp_extractor.value_net",
                                  _seq_linears(sd, "mlp_extractor.value_net")),
            "action_net": _dense(sd, "action_net"),
            "value_net": _dense(sd, "value_net"),
            "log_std": np.asarray(sd["log_std"], np.float32),
        }}
        _check_tree(mapped, model._state.params, "ActorCriticPolicy")
        mapped = jax.tree_util.tree_map(np.asarray, mapped)
        model._state = model._state.replace(params=mapped)
        return model

    def _critic(prefix, twin):
        qf0 = {"qf_latent": _mlp_params(sd, f"{prefix}.qf0",
                                        _seq_linears(sd, f"{prefix}.qf0")[:-1]),
               "qf_out": _dense(
                   sd, f"{prefix}.qf0.{_seq_linears(sd, f'{prefix}.qf0')[-1]}")}
        if not twin:
            return {"params": qf0}
        qf1 = {"qf_latent": _mlp_params(sd, f"{prefix}.qf1",
                                        _seq_linears(sd, f"{prefix}.qf1")[:-1]),
               "qf_out": _dense(
                   sd, f"{prefix}.qf1.{_seq_linears(sd, f'{prefix}.qf1')[-1]}")}
        return {"params": {"qf0": qf0, "qf1": qf1}}

    if kind == "sac":
        idxs = _seq_linears(sd, "actor.latent_pi")
        net_arch = tuple(sd[f"actor.latent_pi.{i}.weight"].shape[0]
                         for i in idxs)
        model = SAC(env=env, n_envs=n_envs or 1, net_arch=net_arch, **hyper)
        actor = {"params": {
            "latent_pi": _mlp_params(sd, "actor.latent_pi", idxs),
            "mu": _dense(sd, "actor.mu"),
            "log_std": _dense(sd, "actor.log_std"),
        }}
        critic = _critic("critic", twin=True)
        target = (_critic("critic_target", twin=True)
                  if any(k.startswith("critic_target.") for k in sd)
                  else jax.tree_util.tree_map(np.copy, critic))
        _check_tree(actor, model._state.actor_params, "SAC actor")
        _check_tree(critic, model._state.critic_params, "SAC critic")
        st = model._state
        repl = dict(actor_params=actor, critic_params=critic,
                    critic_target_params=target)
        lec = blob["pytorch_variables"].get("log_ent_coef")
        if lec is not None:
            repl["log_ent_coef"] = np.float32(np.asarray(lec).reshape(()))
        model._state = st.replace(**{
            k: jax.tree_util.tree_map(np.asarray, v)
            for k, v in repl.items()})
        return model

    if kind in ("td3", "ddpg"):
        idxs = _seq_linears(sd, "actor.mu")
        net_arch = tuple(sd[f"actor.mu.{i}.weight"].shape[0]
                         for i in idxs[:-1])
        cls = TD3 if kind == "td3" else DDPG
        model = cls(env=env, n_envs=n_envs or 1, net_arch=net_arch, **hyper)
        twin = kind == "td3"

        def _actor(prefix):
            return {"params": {
                "latent_pi": _mlp_params(sd, prefix, idxs[:-1]),
                "mu": _dense(sd, f"{prefix}.{idxs[-1]}"),
            }}

        actor = _actor("actor.mu")
        actor_t = (_actor("actor_target.mu")
                   if any(k.startswith("actor_target.") for k in sd)
                   else jax.tree_util.tree_map(np.copy, actor))
        critic = _critic("critic", twin=twin)
        target = (_critic("critic_target", twin=twin)
                  if any(k.startswith("critic_target.") for k in sd)
                  else jax.tree_util.tree_map(np.copy, critic))
        _check_tree(actor, model._state.actor_params, f"{kind} actor")
        _check_tree(critic, model._state.critic_params, f"{kind} critic")
        model._state = model._state.replace(
            actor_params=jax.tree_util.tree_map(np.asarray, actor),
            actor_target_params=jax.tree_util.tree_map(np.asarray, actor_t),
            critic_params=jax.tree_util.tree_map(np.asarray, critic),
            critic_target_params=jax.tree_util.tree_map(np.asarray, target))
        return model

    raise ValueError(f"unsupported algo {kind!r}")
