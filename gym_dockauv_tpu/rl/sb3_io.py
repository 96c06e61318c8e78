"""SB3 1.5.0 checkpoint interop: load AND write reference-format .zip models.

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

`to_sb3_zip` is the exact inverse: it writes our PPO/A2C/SAC/TD3/DDPG
params into a zip that a stock SB3 1.5.0 `.load()` accepts end-to-end
(data JSON incl. serialized policy_class + gym spaces, strict-matching
policy.pth state_dict, fresh optimizer state dicts for set_parameters'
exact_match, pytorch_variables.pth for SAC's log_ent_coef), so policies
trained here evaluate in the reference's own predict/plot pipeline.  The
serialized members are emitted as hand-built pickle GLOBAL/REDUCE streams
(no gym/SB3/torch import needed to *reference* their classes), and torch
is only needed to write the .pth tensors.
"""
from __future__ import annotations

import io
import json
import pickle
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


# ---------------------------------------------------------------------------
# export: our models -> stock SB3-1.5.0-loadable .zip (save_util.py:287-447)
# ---------------------------------------------------------------------------
class _Ref:
    """A by-reference pickle of `module.name` — emitted as a raw GLOBAL
    opcode so the *writer* never has to import the module (gym / SB3 are
    not installed here); the *loader* (SB3's json_to_data ->
    cloudpickle.loads) resolves it in its own environment."""

    def __init__(self, module: str, name: str):
        self.module, self.name = module, name


class _Call:
    """Pickles as `ref(*args)` via a REDUCE opcode (e.g. construct a
    gym.spaces.Box(low, high) on the loader's side)."""

    def __init__(self, ref: _Ref, *args):
        self.ref, self.args = ref, args


class _RefPickler(pickle._Pickler):  # pure-python Pickler: save() overridable
    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, _Ref):
            self.write(b"c" + obj.module.encode("utf-8") + b"\n"
                       + obj.name.encode("utf-8") + b"\n")
            self.memoize(obj)
        elif isinstance(obj, _Call):
            self.save(obj.ref)
            self.save(tuple(obj.args))
            self.write(b"R")
            self.memoize(obj)
        else:
            super().save(obj, save_persistent_id)


def _ref_pickle(obj) -> bytes:
    buf = io.BytesIO()
    _RefPickler(buf, protocol=2).dump(obj)
    return buf.getvalue()


def _data_to_json(data: Dict) -> str:
    """SB3 save_util.data_to_json format (save_util.py:75-127): plain JSON
    where possible, {":type:", ":serialized:"} cloudpickle-b64 otherwise."""
    import base64

    out = {}
    for k, v in data.items():
        try:
            json.dumps(v)
            out[k] = v
        except (TypeError, ValueError):
            out[k] = {
                ":type:": str(type(v)),
                ":serialized:": base64.b64encode(_ref_pickle(v)).decode(),
            }
    return json.dumps(out, indent=4)


def _tt(w: np.ndarray):
    """flax kernel (in, out) -> torch weight (out, in) tensor."""
    import torch

    return torch.from_numpy(np.asarray(w, np.float32).T.copy())


def _tv(b: np.ndarray):
    import torch

    return torch.from_numpy(np.asarray(b, np.float32).copy())


def _seq_sd(sd, prefix, mlp, start=0, stride=2):
    """Write flax MLP {Dense_j} params as torch Sequential Linear keys."""
    for j in range(len(mlp) if isinstance(mlp, (list, tuple)) else
                   len([k for k in mlp if k.startswith("Dense_")])):
        layer = mlp[f"Dense_{j}"]
        i = start + stride * j
        sd[f"{prefix}.{i}.weight"] = _tt(layer["kernel"])
        sd[f"{prefix}.{i}.bias"] = _tv(layer["bias"])


def _dense_sd(sd, prefix, leaf):
    sd[f"{prefix}.weight"] = _tt(leaf["kernel"])
    sd[f"{prefix}.bias"] = _tv(leaf["bias"])


def _adam_state(n_params: int, lr: float) -> Dict:
    """A fresh torch Adam state_dict: satisfies set_parameters' optimizer
    slots (base_class.py:620-637 loads it verbatim; param count must match)."""
    return {"state": {},
            "param_groups": [{"lr": float(lr), "betas": (0.9, 0.999),
                              "eps": 1e-8, "weight_decay": 0,
                              "amsgrad": False, "maximize": False,
                              "params": list(range(n_params))}]}


def _spaces(core):
    obs_low, obs_high = core.observation_bounds()
    box = _Ref("gym.spaces", "Box")
    obs_space = _Call(box, np.asarray(obs_low, np.float32),
                      np.asarray(obs_high, np.float32))
    act_space = _Call(box, np.asarray(core.action_low, np.float32),
                      np.asarray(core.action_high, np.float32))
    return obs_space, act_space


def _n_leaves(tree) -> int:
    return len(jax.tree_util.tree_leaves(tree))


def to_sb3_zip(model, path: str) -> str:
    """Write one of our trained models as a stock SB3-1.5.0 .zip.

    The reverse of `from_sb3_zip`: `PPO.load(path)` / `SAC.load(path)` /
    `TD3.load(path)` on a real SB3 1.5.0 install (or the reference's
    vendored copy) reconstructs a torch policy whose deterministic
    `predict` matches ours (tests/test_sb3_io.py round-trips this through
    the vendored SB3).  Pass `env=None`-style loads work (spaces ship in
    the data JSON); optimizers are fresh (state {}), so resumed *training*
    on the SB3 side starts with reset Adam moments.
    """
    import torch

    if not path.endswith(".zip"):
        path = path + ".zip"
    name = type(model).__name__
    core = model.core
    lr = float(getattr(model.cfg, "learning_rate", 3e-4))
    obs_space, act_space = _spaces(core)
    data = {
        "observation_space": obs_space,
        "action_space": act_space,
        "n_envs": 1,
        "verbose": 0,
        "seed": None,
        "learning_rate": lr,
        "num_timesteps": int(model.num_timesteps),
        "_total_timesteps": int(model.num_timesteps),
    }
    params: Dict[str, Dict] = {}
    pytorch_variables = None

    if name in ("PPO", "A2C"):
        p = jax.device_get(model._state.params)["params"]
        pi_arch = [np.shape(p["mlp_pi"][f"Dense_{j}"]["bias"])[0]
                   for j in range(len(p["mlp_pi"]))]
        vf_arch = [np.shape(p["mlp_vf"][f"Dense_{j}"]["bias"])[0]
                   for j in range(len(p["mlp_vf"]))]
        data.update({
            "policy_class": _Ref("stable_baselines3.common.policies",
                                 "ActorCriticPolicy"),
            "policy_kwargs": {"net_arch": [{"pi": pi_arch, "vf": vf_arch}]},
            "gamma": float(getattr(model.cfg, "gamma", 0.99)),
        })
        sd = {"log_std": _tv(p["log_std"])}
        _seq_sd(sd, "mlp_extractor.policy_net", p["mlp_pi"])
        _seq_sd(sd, "mlp_extractor.value_net", p["mlp_vf"])
        _dense_sd(sd, "action_net", p["action_net"])
        _dense_sd(sd, "value_net", p["value_net"])
        params["policy"] = sd
        params["policy.optimizer"] = _adam_state(_n_leaves(p), lr)

    elif name == "SAC":
        st = model._state
        a = jax.device_get(st.actor_params)["params"]
        c = jax.device_get(st.critic_params)["params"]
        ct = jax.device_get(st.critic_target_params)["params"]
        net_arch = [np.shape(a["latent_pi"][f"Dense_{j}"]["bias"])[0]
                    for j in range(len(a["latent_pi"]))]
        data.update({
            "policy_class": _Ref("stable_baselines3.sac.policies",
                                 "SACPolicy"),
            "policy_kwargs": {"net_arch": net_arch},
            "ent_coef": "auto",
            # resolved numerically: "auto" needs an env at load time
            # (sac.py:150-152), and env=None loads must work
            "target_entropy": float(-core.n_actions),
            "buffer_size": 10_000,  # keep stock-side loads lightweight
            "gamma": float(getattr(model.cfg, "gamma", 0.99)),
            "tau": float(getattr(model.cfg, "tau", 0.005)),
        })
        sd = {}
        _seq_sd(sd, "actor.latent_pi", a["latent_pi"])
        _dense_sd(sd, "actor.mu", a["mu"])
        _dense_sd(sd, "actor.log_std", a["log_std"])
        for pref, tree in (("critic", c), ("critic_target", ct)):
            for qf in ("qf0", "qf1"):
                _seq_sd(sd, f"{pref}.{qf}", tree[qf]["qf_latent"])
                k = 2 * len(tree[qf]["qf_latent"])
                _dense_sd(sd, f"{pref}.{qf}.{k}", tree[qf]["qf_out"])
        params["policy"] = sd
        params["actor.optimizer"] = _adam_state(_n_leaves(a), lr)
        params["critic.optimizer"] = _adam_state(_n_leaves(c), lr)
        params["ent_coef_optimizer"] = _adam_state(1, lr)
        lec = float(np.asarray(jax.device_get(st.log_ent_coef)).reshape(()))
        pytorch_variables = {"log_ent_coef":
                             torch.tensor([lec], dtype=torch.float32)}

    elif name in ("TD3", "DDPG"):
        st = model._state
        a = jax.device_get(st.actor_params)["params"]
        at = jax.device_get(st.actor_target_params)["params"]
        c = jax.device_get(st.critic_params)["params"]
        ct = jax.device_get(st.critic_target_params)["params"]
        twin = "qf1" in c
        net_arch = [np.shape(a["latent_pi"][f"Dense_{j}"]["bias"])[0]
                    for j in range(len(a["latent_pi"]))]
        data.update({
            "policy_class": _Ref("stable_baselines3.td3.policies",
                                 "TD3Policy"),
            "policy_kwargs": {"net_arch": net_arch},
            "buffer_size": 10_000,
            "gamma": float(getattr(model.cfg, "gamma", 0.99)),
            "tau": float(getattr(model.cfg, "tau", 0.005)),
        })
        if name == "DDPG":
            # DDPG = TD3 w/ a single critic; SB3 mirrors this via
            # policy_kwargs (td3/policies.py n_critics)
            data["policy_kwargs"]["n_critics"] = 1
        sd = {}
        for pref, tree in (("actor", a), ("actor_target", at)):
            _seq_sd(sd, f"{pref}.mu", tree["latent_pi"])
            k = 2 * len(tree["latent_pi"])
            _dense_sd(sd, f"{pref}.mu.{k}", tree["mu"])
        qfs = ("qf0", "qf1") if twin else ("qf0",)
        for pref, tree in (("critic", c), ("critic_target", ct)):
            src = tree if twin else {"qf0": tree}
            for qf in qfs:
                _seq_sd(sd, f"{pref}.{qf}", src[qf]["qf_latent"])
                k = 2 * len(src[qf]["qf_latent"])
                _dense_sd(sd, f"{pref}.{qf}.{k}", src[qf]["qf_out"])
        params["policy"] = sd
        params["actor.optimizer"] = _adam_state(_n_leaves(a), lr)
        params["critic.optimizer"] = _adam_state(_n_leaves(c), lr)

    else:
        raise ValueError(f"to_sb3_zip: unsupported model type {name!r}")

    with zipfile.ZipFile(path, mode="w") as z:
        z.writestr("data", _data_to_json(data))
        for fname, sdict in params.items():
            buf = io.BytesIO()
            torch.save(sdict, buf)
            z.writestr(fname + ".pth", buf.getvalue())
        if pytorch_variables is not None:
            buf = io.BytesIO()
            torch.save(pytorch_variables, buf)
            z.writestr("pytorch_variables.pth", buf.getvalue())
        z.writestr("_stable_baselines3_version", "1.5.0")
        z.writestr("system_info.txt",
                   "OS: exported by gym_dockauv_tpu rl/sb3_io.py\n")
    return path
