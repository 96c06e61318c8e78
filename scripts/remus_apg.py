"""Closed-loop analytic-policy-gradient (APG) crack of ObstaclesCurrentRemus.

scripts/remus_trajopt.py showed that backprop through the exact env docks
single instances at the TRUE 0.5 m tolerance (min_d 0.04-0.2) but per-
instance open-loop shooting hits local minima on spawns that need a
turn-around.  Here a single feedback policy pi(obs) -> action is trained by
BPTT through full rollouts across a fresh batch of scenario instances per
iteration — the shared policy generalizes the turn/approach law across
instances, which is exactly what model-free SAC/PPO failed to learn at this
precision (caps det ~0.1-0.5; see remus_crack.py post-mortems).

Gradient hygiene (what made it work):
- fins are parameterized over the effective +/-0.52 rad actuator band: the
  in-dynamics saturation clip (remus100.py:462-470) is gradient-dead
  outside it (trajopt run 1: zero progress at full +/-10 rad range).
- gradients are stopped on the radar block obs[16:36]: ray-intersection
  geometry is piecewise-smooth at best; the policy still SEES the radar,
  while collision avoidance learns through a smooth capsule-SDF penalty.
- dense shaping (mean distance + mean clearance hinge) on top of the
  soft-first-passage objective: softmin alone has near-zero gradient far
  from its argmin.

Usage: python scripts/remus_apg.py [--iters 3000] [--batch 128] ...
Writes logs/remus_crack/apg.json (+ eval history) and the policy params.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gym_dockauv_tpu.envs.core import make_env
from gym_dockauv_tpu.ops import rays

DEFAULT_ENV = "ObstaclesCurrentDocking3d_remus-v0"
OUT = "logs/remus_crack"

# Scenario capsule-slot layout, set by main() from --env (round 4 made
# this script env-generic so the flagship recipe back-ports to the other
# remus matrix rows): slot 0 is the goal-carrying center capsule except
# for the NoCap kinds, where the ring occupies slots 0-3
# (gym_dockauv_tpu/envs/scenarios.py:126-145).
_HAS_CENTER = True
_RING_START = 1


def capsule_sdf(state, position):
    """Signed distance to the collision shells (cap_r + safety 1.0),
    split center (goal-carrying) vs ring: collision telemetry on the
    apgB policy showed 61% of collisions are RING hits at median
    delta_d=6.0 (mid-flight), which need early repulsion, while the
    center shell carries the goal ON it and tolerates none.  Scenarios
    without a ring (Capsule*) mask the ring slots to +inf, which zeroes
    every ring term downstream; scenarios without a center (NoCap) have
    no center shell at all."""
    d = rays.dist_segment_point(position[..., None, :], state.cap_a, state.cap_b)
    sdf = d - state.cap_r - 1.0
    # mask with a large FINITE sentinel, not inf: a scenario with NO ring
    # capsules makes sdf_ring identically inf, and the cummin/min VJP on
    # an all-inf array is NaN (measured: bad=batch on CapsuleDocking3d
    # smoke) — 1e4 m is beyond every shaping length scale, so the ring
    # terms still evaluate to exactly 0 with clean zero gradients
    sdf = jnp.where(state.cap_valid, sdf, 1e4)
    center = (sdf[..., 0] if _HAS_CENTER
              else jnp.full(sdf.shape[:-1], 1e4, sdf.dtype))
    return center, jnp.min(sdf[..., _RING_START:], axis=-1)


def geodesic_distance(position, goal, radius=1.9, chirality="none"):
    """Distance from position to goal going AROUND the center capsule's
    shell circle (xy-projection; tangent-arc-tangent closed form).

    Failure telemetry on the apgF policy: far-side goals succeed 0.205
    vs near-side 0.605, and 90/97 fatal center-shell collisions are
    far-side — the Euclidean delta_d gradient pulls straight THROUGH
    the capsule.  The geodesic's gradient pulls around it.  Smoothly
    equals the straight-line distance whenever the segment clears the
    circle.

    radius: guidance-circle radius.  1.9 (just under the 2.0 m shell)
    hugs the shell, but the measured full-rudder turn radius is
    2.7-2.9 m (scripts probe, all rpm) — an r~2 circle is dynamically
    UNTRACKABLE and the policy oscillates between shell cuts and ring-
    band swings (remus_eval --diag: ring 2/3 / center 1/3 of deaths).
    radius ~3 sits in the trackable middle of the (2, 4) corridor
    between the center shell and the ring shells.  When radius exceeds
    the goal's 2.0 m ring (on-shell goal), the wrap targets a GATE
    point above the goal on the guidance circle and the final radial
    dive is added as a constant leg — without the gate, a policy ON
    the circle over the goal would read distance 0 and never dock.
    """
    p, g_true = position[:2], goal[:2]
    g_norm = jnp.linalg.norm(g_true)
    dive = jnp.maximum(radius + 0.05 - g_norm, 0.0)
    # wrap target: the goal itself when it lies outside the guidance
    # circle (radius <= 2.0), else the GATE point above it on the circle
    g = jnp.where(dive > 0.0, g_true / jnp.maximum(g_norm, 1e-6)
                  * (radius + 0.05), g_true)
    dz = position[2] - goal[2]
    np_, ng = jnp.linalg.norm(p), jnp.linalg.norm(g)
    straight = jnp.linalg.norm(p - g_true)
    # blocked test against the SHELL (1.9, just under the true 2.0 m
    # collision circle), NOT the guidance radius: a straight segment
    # crossing open water between shell and guidance circle needs no
    # detour, and the endpoint (on-shell goal) sits inside a wide
    # guidance circle which would otherwise mark every instance blocked
    shell_r = jnp.minimum(radius, 1.9)
    t = jnp.clip(jnp.dot(-p, g_true - p) / (straight ** 2 + 1e-12),
                 0.0, 1.0)
    # safe norm: colinear p,g put the closest point exactly at the
    # origin (seg_d = 0), where norm's gradient is NaN — and seg_d now
    # feeds the differentiable sigmoid blend below, not just a boolean
    seg_d = jnp.sqrt(jnp.sum((p + t * (g_true - p)) ** 2) + 1e-12)
    safe_np = jnp.maximum(np_, radius + 1e-4)
    safe_ng = jnp.maximum(ng, radius + 1e-4)
    lp = jnp.sqrt(jnp.maximum(safe_np ** 2 - radius ** 2, 1e-8))
    lg = jnp.sqrt(jnp.maximum(safe_ng ** 2 - radius ** 2, 1e-8))
    # keep arccos args strictly inside (-1, 1): d/dx arccos = -1/sqrt(1-x^2)
    # is infinite at +-1, and p,g colinear (straight-at-goal, the common
    # case) lands exactly there — unguarded this made ~1/3 of instances'
    # gradients non-finite (apgI run 1, bad=85/256)
    eps = 1e-3
    tan_p = jnp.arccos(jnp.clip(radius / safe_np, eps - 1.0, 1.0 - eps))
    tan_g = jnp.arccos(jnp.clip(radius / safe_ng, eps - 1.0, 1.0 - eps))
    if chirality == "none":
        cosang = jnp.clip(jnp.dot(p, g) / (safe_np * safe_ng),
                          -1.0 + eps, 1.0 - eps)
        sweep = jnp.arccos(cosang)
    else:
        # FIXED-CHIRALITY detour: the obs gives no absolute position
        # (radar is a forward cone, the nav head is goal-relative), so a
        # memoryless policy cannot learn "go around the SHORTER way" —
        # the shorter-side geodesic teaches opposite turns from nearly
        # identical observations and caps far-side success at a coin
        # flip (measured: near-side 0.605 vs far-side 0.205).  Forcing
        # one detour direction costs <= pi*R ~ 6 m of path (~4 s at
        # cruise, episode budget 100 s) and is learnable memorylessly.
        th_p = jnp.arctan2(p[1], p[0])
        th_g = jnp.arctan2(g[1], g[0])
        sweep = jnp.mod(th_g - th_p, 2 * jnp.pi)      # ccw sweep p -> g
        if chirality == "cw":
            sweep = 2 * jnp.pi - sweep
    wrap = sweep - tan_p - tan_g
    wrapped = lp + lg + radius * jnp.maximum(wrap, 0.0) + dive
    # with a guidance radius above the shell the two branches no longer
    # meet at the blocked boundary (the wrap detours around r=3 while the
    # straight segment only grazes r=1.9) — blend smoothly, with the band
    # centered 0.3 INSIDE the shell: the on-shell goal makes every
    # terminal approach segment sit at seg_d = 2.0, which must stay
    # firmly on the straight branch (w(2.0) ~ 0.02) or the wrap cost
    # distorts final-approach gradients
    w = jax.nn.sigmoid((shell_r - 0.3 - seg_d) / 0.1)
    geo_xy = w * wrapped + (1.0 - w) * straight
    return jnp.sqrt(geo_xy ** 2 + dz ** 2), geo_xy


def gap_via_distance(position, goal, ring_az, radius=1.9,
                     chirality="none"):
    """Guided distance that routes RING ENTRY through a gap.

    Failure telemetry (apgO, remus_eval/probe): 56% of far-side
    collisions die ON the ring band (r 6.6-7.9) at median step 87,
    126-164 deg away from the goal — i.e. at ENTRY on the spawn side,
    never reaching the detour.  The center-capsule geodesic is blind to
    the ring: its tangent direction at spawn drags the path obliquely
    across the ring band.  Here, while the vehicle is OUTSIDE the ring
    circle (r=6), the cost routes through the best of the 4 gap
    midpoints (softmin; smooth in both position and ring phase), then
    blends into the plain center geodesic once inside.  Training-only
    privilege: the ring phase comes from the env state (the policy
    still only sees the radar).
    """
    p3 = position
    p, g = position[:2], goal[:2]
    rho = jnp.linalg.norm(p)
    d_in, _ = geodesic_distance(p3, goal, radius=radius,
                                chirality=chirality)
    # 4 gap midpoints on the ring circle
    gap_az = ring_az + jnp.pi / 4.0 + (jnp.pi / 2.0) * jnp.arange(4.0)
    vias = 6.0 * jnp.stack([jnp.cos(gap_az), jnp.sin(gap_az)], axis=-1)
    leg1 = jnp.linalg.norm(p[None, :] - vias, axis=-1)
    _, leg2 = jax.vmap(
        lambda v: geodesic_distance(
            jnp.concatenate([v, goal[2:]]), goal, radius=radius,
            chirality=chirality))(vias)
    planar = leg1 + leg2
    tau = 0.5
    d_gap_xy = -tau * jax.nn.logsumexp(-planar / tau)
    dz = position[2] - goal[2]
    d_gap = jnp.sqrt(d_gap_xy ** 2 + dz ** 2)
    # outside the ring circle -> gap routing; inside -> center geodesic
    w_out = jax.nn.sigmoid((rho - 5.0) / 0.5)
    return w_out * d_gap + (1.0 - w_out) * d_in


def mlp_init(key, sizes):
    params = []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        scale = jnp.sqrt(2.0 / m)
        if i == len(sizes) - 2:
            scale = 0.01  # small head: start near mid-range actions
        params.append((jax.random.normal(k, (m, n)) * scale, jnp.zeros(n)))
    return params


def mlp_apply(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default=DEFAULT_ENV,
                    help="any *_remus-v0 scenario; the guidance machinery "
                    "degrades gracefully (no ring -> ring terms vanish "
                    "via the inf-masked SDF; no center -> pass a small "
                    "--geo-radius so the geodesic reduces to straight-"
                    "line distance)")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--horizon", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--eval-episodes", type=int, default=256,
                    help="tracker eval size; 256 has ~0.031 binomial std "
                    "and best-checkpoint selection on it harvests noise "
                    "(+0.04-0.07 inflation measured against 2048-episode "
                    "re-evals) — use 1024 for honest near-0.5 selection")
    ap.add_argument("--obs-grad", default="none",
                    choices=("none", "head", "full"),
                    help="which obs block gradients flow through; 'none' "
                    "(detached-state pathwise gradients) is NaN-free at "
                    "every horizon, 'head' (goal-relative dims 0:16) NaNs "
                    "past ~150 steps via a _nav_errors singularity")
    ap.add_argument("--pen-weight", type=float, default=0.0,
                    help="capsule penetration penalty weight; 0 = pure "
                    "approach (phase A), >0 for the collision fine-tune "
                    "(phase B, warm-started via --init-params)")
    ap.add_argument("--pen-ring", type=float, default=None,
                    help="separate weight for the RING shells (default: "
                    "--pen-weight).  Ring hits are ~60%% of remaining "
                    "collisions at median 6 m from goal (mid-flight "
                    "avoidance, remus_eval --diag), while the center "
                    "weight cannot be raised without suppressing docks "
                    "on the on-shell goal — decouple them.")
    ap.add_argument("--act-reg", type=float, default=1e-3,
                    help="L2 penalty on the pre-tanh head output: without "
                    "it the head drifts to |pre|~13 (100%% saturated, "
                    "tanh' = 0) and learning freezes permanently "
                    "(measured, apg run 1)")
    ap.add_argument("--init-params", default=None,
                    help="warm-start policy pkl (phase B)")
    ap.add_argument("--geo-radius", type=float, default=None,
                    help="guidance-circle radius override (default: 0.1 "
                    "under the scaled shell).  Measured full-rudder turn "
                    "radius is 2.7-2.9 m at every rpm, so the default "
                    "shell-hugging r~1.9 circle is untrackable — ~3.0 "
                    "sits mid-corridor between the center shell (2) and "
                    "the ring shells (4) and engages the gate leg in "
                    "geodesic_distance")
    ap.add_argument("--geodesic", action="store_true",
                    help="guide the cost with the geodesic distance "
                    "around the center shell instead of Euclidean "
                    "delta_d (see geodesic_distance docstring)")
    ap.add_argument("--gap-via", action="store_true",
                    help="route ring ENTRY through the best of the 4 "
                    "ring-gap midpoints before blending into the center "
                    "geodesic (see gap_via_distance: 56%% of far-side "
                    "deaths are ring hits at entry, which the center "
                    "geodesic is blind to)")
    ap.add_argument("--chirality", default="none",
                    choices=("none", "ccw", "cw"),
                    help="force the geodesic detour direction (see "
                    "geodesic_distance: fixed chirality is the "
                    "memoryless-policy-compatible detour strategy)")
    ap.add_argument("--mean-d", type=float, default=0.3,
                    help="weight of the mean-distance shaping term; far-"
                    "side goals need a detour AROUND the ring, which "
                    "this term actively penalizes — lower it once the "
                    "policy approaches reliably")
    ap.add_argument("--stage-target", default="both",
                    choices=("both", "ring"),
                    help="which capsule radii the homotopy scales: 'ring' "
                    "keeps the center capsule (and thus the terminal "
                    "docking geometry) at the true scale in every stage")
    ap.add_argument("--stages", default="",
                    help="geometry homotopy: comma list of scale:iters "
                    "(e.g. '0.4:2500,0.7:2500,1.0:5000').  Each stage "
                    "trains on an env whose ring AND center capsule radii "
                    "are scaled (goal placement unchanged, so scale<1 "
                    "opens a clearance band around the on-shell goal); "
                    "eval is ALWAYS the true scale-1.0 config.  APG has "
                    "no replay to poison, so the moving MDP is safe — "
                    "this is a continuation method, not a curriculum "
                    "ladder.  Empty = single stage at 1.0 x --iters.  "
                    "Optional 3rd/4th fields scale:iters:smin:smax set a "
                    "SPAWN WINDOW (env spawn_lerp_min/max) for the stage: "
                    "the spawn sweeps from near-goal out to the true "
                    "[-8,0,0] — the anneal that took HerSAC to its 0.50 "
                    "best (remus_crack.py her_window), here composed with "
                    "the GRU + gap-via gradient path.  Default 1:1 = "
                    "reference spawn.")
    ap.add_argument("--spawn-clearance", type=float, default=0.0,
                    help="extra shell clearance (m) for lerped spawns in "
                    "window stages: near-goal rest spawns drift into the "
                    "shell on the 1 s actuator lag under the 0.5-1 m/s "
                    "grid current (a collision floor no objective can "
                    "remove; measured in remus_crack her_window post-"
                    "mortem)")
    ap.add_argument("--spawn-speed", type=float, default=0.0,
                    help="initial surge speed (m/s, prop pre-spun) in "
                    "window stages: docking-from-rest next to the shell "
                    "is a different maneuver from the true task's arrive-"
                    "at-speed approach")
    ap.add_argument("--spawn-aim", action="store_true",
                    help="aim the spawn attitude at the goal in window "
                    "stages")
    ap.add_argument("--d-floor", type=float, default=0.0,
                    help="floor the distance cost at this value: success "
                    "only needs d < 0.5, and the goal sits ON the "
                    "collision shell, so rewarding d below ~0.3 drives "
                    "knife-edge shell-hugging docks (measured: +/-0.08 "
                    "eval noise on adjacent evals of the same policy)")
    ap.add_argument("--ring-clear", type=float, default=0.0,
                    help="weight of a per-step RING clearance hinge "
                    "mean(softplus(margin - sdf_ring)): the survival "
                    "term's cummin only pushes on the single closest-"
                    "approach step, but entry deaths are grazing "
                    "incidents along the whole ring passage (56%% of "
                    "far-side deaths, r 6.6-7.9).  Ring-only: a hinge "
                    "on the center shell would fight on-shell docking.")
    ap.add_argument("--ring-margin", type=float, default=0.5,
                    help="clearance margin (m beyond the +1.0 safety "
                    "shell) where the --ring-clear hinge engages")
    ap.add_argument("--ring-slow", type=float, default=0.0,
                    help="weight of a speed-x-proximity penalty "
                    "mean(sigmoid((margin-sdf_ring)/0.2) * relu(|u| - "
                    "vcap)): ring deaths are GRAZING incidents during "
                    "passage (apgC2 diag: 73%% of collisions on the ring "
                    "at median 6.1 m from goal), and at full cruise the "
                    "2.7-2.9 m turn radius leaves no correction margin "
                    "inside the 4.5 m gap corridor — teach the policy to "
                    "shed speed near ring shells")
    ap.add_argument("--ring-slow-vcap", type=float, default=1.2,
                    help="surge speed (m/s) above which --ring-slow "
                    "penalizes proximity to ring shells")
    ap.add_argument("--prev-act", action="store_true",
                    help="append the previous raw action (3 dims, "
                    "[-1,1]) to the policy input: the REMUS actuator has "
                    "a 1 s first-order lag (remus100.py:463-476) whose "
                    "state u_actual is NOT in the obs — the policy "
                    "cannot otherwise know where its fins actually are")
    ap.add_argument("--far-weight", type=float, default=1.0,
                    help="gradient weight multiplier for FAR-SIDE "
                    "instances (goal azimuth > 90 deg from the spawn "
                    "azimuth).  The failure split is persistently "
                    "lopsided (remus_eval --diag: far 0.31 vs near 0.62 "
                    "on apgO) while far/near are drawn ~50/50 — "
                    "oversample the hard half in the batch gradient.")
    ap.add_argument("--act-noise", type=float, default=0.0,
                    help="training-only Gaussian noise std on the pre-"
                    "tanh action (eval stays deterministic).  Randomized "
                    "smoothing: adjacent evals of the same policy swing "
                    "+/-0.08, i.e. docks sit on knife-edge margins; "
                    "training under actuation noise forces margin.")
    ap.add_argument("--rnn", type=int, default=0,
                    help="GRU hidden size (0 = stateless MLP policy); the "
                    "env is partially observed (no absolute position, "
                    "forward-cone radar) and memory resolves it")
    ap.add_argument("--tag", default="apg",
                    help="output filename stem under logs/remus_crack/")
    args = ap.parse_args()

    global _HAS_CENTER, _RING_START
    drop_center = "NoCap" in args.env
    _HAS_CENTER = (("Capsule" in args.env or "Obstacles" in args.env)
                   and not drop_center)
    _RING_START = 0 if drop_center else 1

    if args.stages:
        stages = []
        for s in args.stages.split(","):
            p = s.split(":")
            stages.append((float(p[0]), int(p[1]),
                           float(p[2]) if len(p) > 2 else 1.0,
                           float(p[3]) if len(p) > 3 else 1.0))
    else:
        stages = [(1.0, args.iters, 1.0, 1.0)]
    total_iters = sum(s[1] for s in stages)

    core = make_env(args.env)
    tol = float(core.config.dist_goal_reached_tol)
    low = jnp.asarray(core.action_low).at[0:2].set(-0.52)
    high = jnp.asarray(core.action_high).at[0:2].set(0.52)

    n_prev = 3 if args.prev_act else 0
    D = 36 + n_prev

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    if args.rnn:
        # GRU policy: the env is PARTIALLY OBSERVED (no absolute position
        # in the obs; the radar is a forward cone), so a memoryless policy
        # cannot represent "which side of the capsule am I on" — memory
        # integrates radar sightings into an implicit pose belief.
        H = args.rnn
        ks = jax.random.split(k_init, 6)
        s_in = jnp.sqrt(1.0 / (D + H))
        params = {
            "wzr": jax.random.normal(ks[0], (D + H, 2 * H)) * s_in,
            "bzr": jnp.zeros(2 * H),
            "wn": jax.random.normal(ks[1], (D + H, H)) * s_in,
            "bn": jnp.zeros(H),
            "head": [(jax.random.normal(ks[2], (H + D, 128))
                      * jnp.sqrt(2.0 / (H + D)), jnp.zeros(128)),
                     (jax.random.normal(ks[3], (128, 3)) * 0.01,
                      jnp.zeros(3))],
        }
        h0 = jnp.zeros((H + n_prev,))
    else:
        params = mlp_init(k_init, (D, 256, 256, 3))
        h0 = jnp.zeros((n_prev,))
    if args.init_params:
        with open(args.init_params, "rb") as f:
            params = jax.tree_util.tree_map(
                jnp.asarray, pickle.load(f))

    def policy_step(params, h_ext, obs):
        """(pre, h_core') — recurrent when --rnn, stateless otherwise.
        With --prev-act the carry is [h_core, prev_raw]; the CALLER
        appends the raw action it actually applies (post-noise during
        training), so the policy sees where its fins were really sent."""
        if args.obs_grad == "none":
            obs = jax.lax.stop_gradient(obs)
        elif args.obs_grad == "head":
            obs = obs.at[16:].set(jax.lax.stop_gradient(obs[16:]))
        if n_prev:
            h = h_ext[: h_ext.shape[0] - n_prev]
            x = jnp.concatenate([obs, h_ext[h_ext.shape[0] - n_prev:]])
        else:
            h, x = h_ext, obs
        if not args.rnn:
            return mlp_apply(params, x), h
        xh = jnp.concatenate([x, h])
        zr = jax.nn.sigmoid(xh @ params["wzr"] + params["bzr"])
        z, r = zr[: args.rnn], zr[args.rnn:]
        n = jnp.tanh(jnp.concatenate([x, r * h]) @ params["wn"]
                     + params["bn"])
        h = (1.0 - z) * h + z * n
        return mlp_apply(params["head"],
                         jnp.concatenate([h, x])), h

    def with_prev(h_core, raw):
        return jnp.concatenate([h_core, raw]) if n_prev else h_core

    def policy(params, obs, h):
        pre, hc = policy_step(params, h, obs)
        raw = jnp.tanh(pre)
        return low + (raw + 1.0) * 0.5 * (high - low), with_prev(hc, raw)

    def make_rollout(core_t, geo_r):
        def rollout(params, state0, obs0, key):
            def body(c, k):
                state, obs, h = c
                pre, hc = policy_step(params, h, obs)
                if args.act_noise > 0.0:
                    pre = pre + args.act_noise * jax.random.normal(
                        k, pre.shape)
                raw = jnp.tanh(pre)
                h = with_prev(hc, raw)
                a = low + (raw + 1.0) * 0.5 * (high - low)
                state, res = core_t.step(state, a)
                sdf0, sdfr = capsule_sdf(state, res.info.position)
                if args.gap_via:
                    ring_az = jnp.arctan2(state.cap_a[_RING_START, 1],
                                          state.cap_a[_RING_START, 0])
                    dd = gap_via_distance(res.info.position, state.goal,
                                          ring_az, radius=geo_r,
                                          chirality=args.chirality)
                elif args.geodesic:
                    dd, _ = geodesic_distance(res.info.position,
                                              state.goal, radius=geo_r,
                                              chirality=args.chirality)
                else:
                    dd = res.info.delta_d
                dd = jnp.maximum(dd, args.d_floor)
                return (state, res.obs, h), (dd, sdf0, sdfr,
                                             jnp.mean(pre ** 2),
                                             jnp.abs(state.vehicle[6]))
            _, (d, sdf0, sdfr, pre2, spd) = jax.lax.scan(
                body, (state0, obs0, h0),
                jax.random.split(key, args.horizon))
            return d, sdf0, sdfr, pre2, spd
        return rollout

    def make_instance_loss(core_t, geo_r):
        rollout = make_rollout(core_t, geo_r)

        def instance_loss(params, state0, obs0, key):
            d, sdf0, sdfr, pre2, spd = rollout(params, state0, obs0, key)
        # Smooth first-passage objective with episode semantics: eval
        # TERMINATES on collision, so a rollout that grazes a shell and
        # then "docks" must earn nothing.  Kill probability comes from
        # the RUNNING MINIMUM of the shell SDF ("did you ever cross"),
        # NOT a per-step survival product — docking means *sustained*
        # proximity to the center shell (the goal sits exactly ON it:
        # goal_radius_margin=0), so any per-step hazard accumulates to
        # certain death over ~50 dock steps and flattens the objective
        # (measured: apgE collapsed 0.41 -> 0.17).  The cummin gradient
        # instead pushes only the single closest-approach step off the
        # shell.  Center scale 5 cm (zero margin), ring 15 cm.
            ring_w = (args.pen_ring if args.pen_ring is not None
                      else args.pen_weight) / max(args.pen_weight, 1e-8)
            dead = (jax.nn.sigmoid(-jax.lax.cummin(sdf0) / 0.05)
                    + ring_w * jax.nn.sigmoid(-jax.lax.cummin(sdfr) / 0.15))
            # one-step LAG: goal_reached and collision latch on the SAME
            # env step (core.py conditions[0]/[4] are independent), so a
            # ballistic radial dock that pierces the shell on the step it
            # enters the 0.5 m ball still counts as success — charge each
            # step only for crossings BEFORE it, not on it.
            dead = jnp.concatenate([jnp.zeros((1,), dead.dtype), dead[:-1]])
            cost = d + args.pen_weight * dead
            tau = 0.3
            soft_min = -tau * jax.nn.logsumexp(-cost / tau)
            # per-step ring clearance hinge (see --ring-clear help);
            # 0.2 softness ~ the shell-graze length scale
            ring_hinge = jnp.mean(
                0.2 * jax.nn.softplus((args.ring_margin - sdfr) / 0.2))
            # speed-x-proximity: grazing ring passages at cruise leave no
            # correction margin (turn radius 2.7-2.9 m vs 4.5 m gaps)
            ring_slow = jnp.mean(
                jax.nn.sigmoid((args.ring_margin - sdfr) / 0.2)
                * jax.nn.relu(spd - args.ring_slow_vcap))
            return (soft_min + args.mean_d * jnp.mean(d)
                    + args.ring_clear * ring_hinge
                    + args.ring_slow * ring_slow
                    + args.act_reg * jnp.mean(pre2))
        return instance_loss

    sched = optax.cosine_decay_schedule(args.lr, total_iters, alpha=0.1)
    # b2=0.99: a single BPTT gradient spike at b2=0.999 poisons Adam's
    # second moment for thousands of iterations (measured: policy docks
    # all instances at iter ~150, then one spike freezes learning for the
    # rest of the run); clip to 1.0 BEFORE adam for the same reason
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(learning_rate=sched, b2=0.99))
    opt_state = opt.init(params)

    def make_train_step(core_t, geo_r):
        instance_loss = make_instance_loss(core_t, geo_r)

        @jax.jit
        def train_step(params, opt_state, key):
            keys = jax.random.split(key, 2 * args.batch)
            k_noise = keys[args.batch:]
            states0, obs0 = jax.vmap(core_t.reset)(
                keys[:args.batch], jnp.zeros((args.batch,), jnp.int32))
            # PER-INSTANCE grads, not grad-of-mean: with batch=128 x
            # 300-step BPTT, >=1 instance per iteration hits a gradient-
            # singular geometry event (inf grad with a FINITE loss), which
            # made the summed batch grad non-finite every step ->
            # sanitize-to-zero -> zero Adam updates -> policy frozen from
            # iter ~300 (measured: det metrics + saturation bit-identical
            # for 9.5k iters).  Mask bad instances and robust-clip each
            # survivor before averaging.
            losses, grads = jax.vmap(
                lambda s0, o0, kn: jax.value_and_grad(instance_loss)(
                    params, s0, o0, kn))(states0, obs0, k_noise)
            gnorm = jnp.sqrt(jax.tree_util.tree_reduce(
                jnp.add, jax.tree_util.tree_map(
                    lambda x: jnp.sum(
                        x ** 2, axis=tuple(range(1, x.ndim))), grads)))
            leaf_ok = jax.tree_util.tree_reduce(
                jnp.logical_and,
                jax.tree_util.tree_map(
                    lambda x: jnp.all(jnp.isfinite(x),
                                      axis=tuple(range(1, x.ndim))), grads))
            ok = jnp.isfinite(losses) & leaf_ok
            # far-side oversampling: weight each instance's (clipped)
            # gradient by w_i and normalize by the surviving weight mass
            far = jnp.sum(states0.goal[:, :2] * states0.vehicle[:, :2],
                          axis=-1) < 0.0
            w_i = jnp.where(far, args.far_weight, 1.0)
            n = jnp.maximum(jnp.sum(jnp.where(ok, w_i, 0.0)), 1e-6)
            scale = jnp.where(ok, w_i * jnp.minimum(
                1.0, 10.0 / (gnorm + 1e-8)), 0.0) / n
            # sanitize BEFORE the contraction: masked rows have scale 0
            # but inf/NaN leaves, and 0 * inf = NaN would poison the
            # averaged grad
            g = jax.tree_util.tree_map(
                lambda x: jnp.tensordot(
                    scale, jnp.where(jnp.isfinite(x), x, 0.0), axes=1),
                grads)
            loss = jnp.sum(jnp.where(ok, losses, 0.0)) / n
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state, loss,
                    jnp.sum(~ok))
        return train_step

    # --- det eval with true episode semantics (done-latched) -------------
    def eval_rollout(params, key, n_episodes=args.eval_episodes):
        keys = jax.random.split(key, n_episodes)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((n_episodes,), jnp.int32))
        step_env = jax.vmap(core.step)

        hs = jnp.zeros((n_episodes,) + h0.shape)

        def body(carry, _):
            states, obs, hs, alive, goal, col = carry
            a, hs = jax.vmap(lambda o, h: policy(params, o, h))(obs, hs)
            states, res = step_env(states, a)
            goal = goal | (res.info.goal_reached & alive)
            col = col | (res.info.collision & alive)
            alive = alive & ~res.done
            return (states, res.obs, hs, alive, goal, col), None

        init = (states, obs, hs, jnp.ones((n_episodes,), bool),
                jnp.zeros((n_episodes,), bool), jnp.zeros((n_episodes,), bool))
        (_, _, _, _, goal, col), _ = jax.lax.scan(
            body, init, None, length=core.config.max_timesteps + 1)
        return jnp.mean(goal), jnp.mean(col)

    jit_eval = jax.jit(eval_rollout, static_argnames=())

    @jax.jit
    def head_saturation(params, key):
        keys = jax.random.split(key, 32)
        states, obs = jax.vmap(core.reset)(
            keys, jnp.zeros((32,), jnp.int32))
        hs = jnp.zeros((32,) + h0.shape)

        def body(c, _):
            st, ob, hs = c
            pre, hcs = jax.vmap(
                lambda o, h: policy_step(params, h, o))(ob, hs)
            raw = jnp.tanh(pre)
            hs = jax.vmap(with_prev)(hcs, raw)
            a = low + (raw + 1.0) * 0.5 * (high - low)
            st, res = jax.vmap(core.step)(st, a)
            return (st, res.obs, hs), jnp.mean(jnp.abs(pre) > 3.0)
        _, sat = jax.lax.scan(body, (states, obs, hs), None, length=100)
        return jnp.mean(sat)

    os.makedirs(OUT, exist_ok=True)
    t0 = time.time()
    history = []
    best = (-1.0, None)
    i = 0
    for scale, stage_iters, smin, smax in stages:
        window = smin != 1.0 or smax != 1.0
        if scale != 1.0 or window:
            import dataclasses as _dc
            center_scale = 1.0 if args.stage_target == "ring" else scale
            cfg_t = _dc.replace(
                core.config, ring_radius_scale=scale,
                center_radius_scale=center_scale,
                spawn_lerp_min=smin, spawn_lerp_max=smax,
                spawn_clearance=args.spawn_clearance if window else 0.0,
                spawn_speed=args.spawn_speed if window else 0.0,
                spawn_aim=args.spawn_aim and window)
            core_t = make_env(args.env, config=cfg_t)
        else:
            center_scale = 1.0
            core_t = core
        geo_r = (args.geo_radius if args.geo_radius is not None
                 else (1.0 * center_scale + 1.0) - 0.1)
        train_step = make_train_step(core_t, geo_r)
        print(f"[{args.tag}] === stage scale={scale} iters={stage_iters} "
              f"window=[{smin},{smax}] geo_r={geo_r:.2f} ===", flush=True)
        for _ in range(stage_iters):
            key, k = jax.random.split(key)
            params, opt_state, loss, bad = train_step(params, opt_state, k)
            if i % args.eval_every == 0 or i == total_iters - 1:
                suc, col = jit_eval(params, jax.random.PRNGKey(7777))
                sat = float(head_saturation(params, jax.random.PRNGKey(3)))
                suc, col = float(suc), float(col)
                history.append({"iter": i, "scale": scale,
                                "window": [smin, smax],
                                "loss": float(loss),
                                "det_success": suc, "det_collision": col,
                                "saturation": sat, "bad_grads": int(bad),
                                "wall_s": time.time() - t0})
                if suc > best[0]:
                    best = (suc, jax.tree_util.tree_map(np.asarray, params))
                    # persist on every improvement: runs are killed mid-
                    # flight when they plateau, and an end-of-run-only
                    # save loses the best params with them
                    with open(f"{OUT}/{args.tag}_policy.pkl", "wb") as f:
                        pickle.dump(best[1], f)
                # keep the latest iterate on disk too: killed phase-A
                # (approach) runs have a near-zero success tracker, so
                # _policy.pkl is an arbitrary early iterate — _final.pkl
                # is the warm start phase B actually wants
                with open(f"{OUT}/{args.tag}_final.pkl", "wb") as f:
                    pickle.dump(
                        jax.tree_util.tree_map(np.asarray, params), f)
                print(f"[{args.tag}] iter {i} (scale {scale}): "
                      f"loss={float(loss):.3f} "
                      f"det_success={suc:.3f} det_collision={col:.3f} "
                      f"sat={sat:.2f} bad={int(bad)} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            i += 1

    os.makedirs(OUT, exist_ok=True)
    suc, col = jit_eval(params, jax.random.PRNGKey(1234))
    final = {"variant": args.tag, "iters": total_iters,
             **vars(args),  # the FULL knob set: A2/B2/C2 post-mortems
             # could not reconstruct which guidance/penalty flags ran
             "final_success": float(suc), "final_collision": float(col),
             "best_success": best[0], "history": history,
             "wall_s": time.time() - t0}
    with open(f"{OUT}/{args.tag}.json", "w") as f:
        json.dump(final, f, indent=1)
    final_np = jax.tree_util.tree_map(np.asarray, params)
    save = best[1] if best[0] > float(suc) else final_np
    with open(f"{OUT}/{args.tag}_policy.pkl", "wb") as f:
        pickle.dump(save, f)
    # end-of-run params, regardless of eval: phase-A (pen_weight=0) runs
    # optimize APPROACH, whose det_success tracker is near-zero noise —
    # best-by-success selection there picks an arbitrary early iterate,
    # while phase B wants the final converged approach law as warm start
    with open(f"{OUT}/{args.tag}_final.pkl", "wb") as f:
        pickle.dump(final_np, f)
    print(f"[{args.tag}] FINAL success={float(suc):.3f} "
          f"collision={float(col):.3f} "
          f"best={best[0]:.3f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
