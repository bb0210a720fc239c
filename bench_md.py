"""MD rollout throughput: on-device velocity-Verlet steps/s on kernel forces.

The north star's "MD stepping on-device" capability with a number: a
whole velocity-Verlet trajectory (``md.velocity_verlet_rollout``) is one
XLA program driven by the fused E+F evaluation — lax and Pallas-kernel
force fields measured side by side, on MD17 aspirin at a molecular-
dynamics-realistic replica batch.

Verification: the kernel-driven trajectory must track the lax-driven one
(same integrator, same initial state) — divergence is chaotic-system
amplified, so the gate is on the FIRST sampled step's positions.

Prints ONE JSON line. Usage: ``python bench_md.py [batch] [n_steps]``.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# aspirin-ish atomic masses by element (amu)
_MASS = {1: 1.008, 6: 12.011, 8: 15.999}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from sake_tpu.data.md17 import ASPIRIN_Z
    from sake_tpu.kernels import model_params_from_linen
    from sake_tpu.kernels import dispatch_energy_forces
    from sake_tpu.md import velocity_verlet_rollout
    from sake_tpu.models import SAKEModel
    from sake_tpu.tasks.md17 import make_energy_force_fn

    z = ASPIRIN_Z
    n = len(z)
    sp = jax.nn.one_hot(z, z.max())
    model = SAKEModel(hidden_features=64, out_features=1, depth=6)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(batch, n, 3) * 1.5, jnp.float32)
    v0 = jnp.asarray(rng.randn(batch, n, 3) * 0.01, jnp.float32)
    masses = jnp.asarray([_MASS[int(zi)] for zi in z], jnp.float32)
    h = jnp.broadcast_to(sp, (batch, n, sp.shape[-1])).astype(jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sp, x0[0])
    kp = model_params_from_linen(params)

    ef_lax = make_energy_force_fn(model, sp, 0.0, 1.0)

    def ef_lax2(p, x):
        e, f = ef_lax(p, x)
        return e.ravel(), f

    def ef_kern(p, x):
        # batch-aware dispatch picks resid_ef below 2048 and one_ef above
        # (the measured crossover — kernels/dispatch.py)
        return dispatch_energy_forces(p, h, x)

    def measure(ef, p):
        roll = jax.jit(
            lambda pp, xx, vv: velocity_verlet_rollout(
                ef, pp, xx, vv, masses, dt=1e-3, n_steps=n_steps,
                sample_every=n_steps,
            )
        )
        xs, vs, es = roll(p, x0, v0)
        jax.block_until_ready(xs)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            xs, vs, es = roll(p, x0, v0)
            float(np.asarray(xs).ravel()[0])
            reps.append(time.perf_counter() - t0)
        rate = n_steps * batch / float(np.median(reps))
        return rate, xs

    lax_rate, xs_lax = measure(ef_lax2, params)
    kern_rate, xs_k = measure(ef_kern, kp)

    # verification gate: one-step position agreement (pre-chaos)
    one = jax.jit(
        lambda p, ef_: velocity_verlet_rollout(
            ef_, p, x0, v0, masses, dt=1e-3, n_steps=1, sample_every=1
        )[0],
        static_argnums=1,
    )
    x1_l = np.asarray(one(params, ef_lax2))
    x1_k = np.asarray(one(kp, ef_kern))
    step_err = float(np.abs(x1_k - x1_l).max() / (np.abs(x1_l).max() + 1e-12))
    ok = step_err < 1e-3
    value = max(lax_rate, kern_rate if ok else 0.0)
    print(
        json.dumps(
            {
                "metric": "md17_aspirin_md_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "molecule-steps/s/chip",
                "lax_value": round(lax_rate, 1),
                "kernel_value": round(kern_rate, 1),
                "kernel_verified": ok,
                "one_step_rel_err": round(step_err, 8),
                "batch": batch,
                "n_steps": n_steps,
            }
        )
    )


if __name__ == "__main__":
    main()
