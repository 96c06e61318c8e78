"""x64 bit-exactness probe: our BlueROV2 step vs the reference's, bitwise.

VERDICT r3 item 4: BASELINE.md claims bit-exact x64 trajectories while the
parity tests assert tight tolerances.  This probe measures the actual x64
gap on the reference's own ODE workload (the test_BlueROV2.test_sim_ode
pattern, 100 steps of `AUVSim.step` with fixed actions) and localizes the
first divergent operation, so the claim can either be made true (a parity
kernel) or corrected with an op-level account.

Usage: python scripts/x64_parity_probe.py [--steps 100]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tests.reference_oracle import load_reference

load_reference()

from gym_dockauv.objects.vehicles.BlueROV2 import BlueROV2  # noqa: E402

from gym_dockauv_tpu.dynamics.statespace import (  # noqa: E402
    coriolis_times_nu,
    damping_times_nu,
    fossen_state_dot,
    fossen_vehicle_step,
    restoring,
)
from gym_dockauv_tpu.dynamics.vehicles import build_bluerov2  # noqa: E402
from gym_dockauv_tpu.ops import geom  # noqa: E402


def ulps(a, b):
    """Per-component distance in units-in-last-place (f64)."""
    ai = np.frombuffer(np.asarray(a, np.float64).tobytes(), np.int64).copy()
    bi = np.frombuffer(np.asarray(b, np.float64).tobytes(), np.int64).copy()
    # map sign-magnitude to monotonic integer line
    ai = np.where(ai < 0, np.int64(-(2**63)) - ai - 1, ai)
    bi = np.where(bi < 0, np.int64(-(2**63)) - bi - 1, bi)
    return np.abs(ai - bi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    xml = os.path.join("/root/reference/gym_dockauv/objects/vehicles",
                       "BlueROV2.xml")
    ref = BlueROV2(xml)
    ref.step_size = 0.1
    params = build_bluerov2(control_mode="joystick", dtype=jnp.float64)

    rng = np.random.default_rng(42)
    state = jnp.zeros(12, jnp.float64)
    u_prev = jnp.zeros(6, jnp.float64)
    nu_c = jnp.zeros(6, jnp.float64)
    ref.state = np.zeros(12)
    ref.u = np.zeros(6)

    step = jax.jit(lambda s, u, a: fossen_vehicle_step(
        params, s, u, a, nu_c, 0.1))

    # --- single-op census on a representative mid-trajectory state ------
    probe_state = jnp.asarray(rng.uniform(-0.5, 0.5, 12))
    nu = np.asarray(probe_state[6:])
    ops = {
        "C(nu)nu": (np.asarray(coriolis_times_nu(params, probe_state[6:])),
                    (ref.C(nu) @ nu)),
        "D(nu)nu": (np.asarray(damping_times_nu(params, probe_state[6:])),
                    (ref.D(nu) @ nu)),
        "G(eta)": (np.asarray(restoring(params, probe_state[:6])),
                   ref.G(np.asarray(probe_state[:6]))),
        "J(eta)nu": (np.asarray(geom.euler_kinematics(probe_state[:6],
                                                      probe_state[6:])),
                     None),  # filled below
        "state_dot": (np.asarray(fossen_state_dot(
            params, probe_state, jnp.zeros(6), nu_c)), None),
    }
    from gym_dockauv.utils import geomutils as ref_geom
    eta = np.asarray(probe_state[:6])
    ops["J(eta)nu"] = (ops["J(eta)nu"][0], ref_geom.J(eta) @ nu)
    ref.state = np.asarray(probe_state).copy()
    ref.u = np.zeros(6)
    ops["state_dot"] = (ops["state_dot"][0],
                        ref.state_dot(0.0, np.asarray(probe_state),
                                      np.zeros(6)))
    print("single-op x64 census (max ULP / max abs diff):")
    for name, (ours, theirs) in ops.items():
        d = np.abs(ours - theirs)
        print(f"  {name:10s} ulp={ulps(ours, theirs).max():>8d} "
              f"abs={d.max():.3e}")

    # --- trajectory -----------------------------------------------------
    ref.state = np.zeros(12)
    ref.u = np.zeros(6)
    first_div = None
    for t in range(args.steps):
        a = rng.uniform(-1.0, 1.0, 6)
        ref.step(a.copy(), np.zeros(6))
        state, u_prev, _ = step(state, u_prev, jnp.asarray(a))
        s_ours = np.asarray(state)
        s_ref = np.asarray(ref.state)
        u = ulps(s_ours, s_ref)
        if u.max() > 0 and first_div is None:
            first_div = (t, int(np.argmax(u)), int(u.max()))
        if t in (0, 1, 9, args.steps - 1) or (first_div and first_div[0] == t):
            print(f"t={t:3d} max_ulp={u.max():>10d} "
                  f"max_abs={np.abs(s_ours - s_ref).max():.3e}")
    if first_div is None:
        print(f"BIT-EXACT over {args.steps} steps")
    else:
        t, i, m = first_div
        print(f"first divergence: step {t}, state component {i}, {m} ulp")


if __name__ == "__main__":
    main()
