"""The REFERENCE'S OWN headline benchmarks, paired on one chip.

The reference repo records no numbers; the only performance artifacts it
ships are two runtime-printed timings (BASELINE.md rows 1-2):

- ``scripts/nbody/speed.py:42-58`` — nbody forward latency: a depth-4
  hidden-64 velocity model applied to 30 batches of 100 graphs x 5
  particles inside ONE jit; prints sec/forward (= elapsed / 30).
- ``scripts/motion/speed.py:66-73`` — motion-capture train-step latency:
  a full-batch (200 walks x 31 joints) MSE gradient step, averaged over
  100 steps; prints sec/step.

This file runs BOTH sides on the same chip with identical synthetic
data of the reference's exact shapes (the .npy/.amc source files are not
in the tree): the reference's actual code path (``sake`` imported from
/root/reference, its loop structure replicated verbatim) and sake_tpu's
model. Before timing, functional parity is proven by converting the
reference's initialized parameters with ``compat.convert_reference_params``
and requiring the two forwards to agree to fp32 tolerance — the timed
programs compute the same function.

One deviation, charitable to the reference: its motion ``step`` has
``@jax.jit`` commented out (eager). Eager dispatch over the device
tunnel is one network round trip per op and unmeasurable, so the
reference step is jitted here (matching its own jitted ``eval`` and the
clear intent of the commented decorator).

Prints ONE JSON line. Usage: ``python bench_headline.py``.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Smoke-test knobs (CPU validation runs): shrink the timed loops without
# touching the measured protocol's defaults (chip runs use the reference's
# exact 30-forward / 100-step structure).
_MOTION_STEPS = int(os.environ.get("SAKE_HEADLINE_MOTION_STEPS", "100"))
_REPEATS = int(os.environ.get("SAKE_HEADLINE_REPEATS", "0")) or None


def _mark(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _force(out):
    """Value readback; block_until_ready alone is unreliable on the
    tunnel (returns before execution finishes)."""
    return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])


def _median_time(fn, repeats=5):
    repeats = _REPEATS or repeats
    _force(fn())  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _interleaved_medians(fns, repeats=7):
    """Median time per function with the passes INTERLEAVED (A B C, A B
    C, ...) so every leg samples the same tunnel-latency state — a
    ~27 ms nbody pass measured in separated blocks wobbles ±10% across
    sessions, which is bigger than the effect being measured (r5)."""
    repeats = _REPEATS or repeats
    for fn in fns:
        _force(fn())  # warmup/compile
    times = [[] for _ in fns]
    for _ in range(repeats):
        for k, fn in enumerate(fns):
            t0 = time.perf_counter()
            _force(fn())
            times[k].append(time.perf_counter() - t0)
    return [float(np.median(t)) for t in times]


def _nbody_data(rng):
    # scripts/nbody/speed.py:16-31 shapes: 30 chunks x batch 100 x 5
    # particles; h = [charge, |v|] (2 features)
    x = jnp.asarray(rng.randn(30, 100, 5, 3), jnp.float32)
    v = jnp.asarray(rng.randn(30, 100, 5, 3), jnp.float32)
    q = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(30, 100, 5, 1)), jnp.float32
    )
    v_norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    h = jnp.concatenate([q, v_norm], axis=-1)
    return h, x, v


def _motion_data(rng):
    # scripts/motion/speed.py:12-24 shapes: full-batch 200 x 31 joints;
    # h = [|v0|, eye(31)] (32 features)
    x0 = jnp.asarray(rng.randn(200, 31, 3), jnp.float32)
    v0 = jnp.asarray(rng.randn(200, 31, 3), jnp.float32)
    x1 = jnp.asarray(rng.randn(200, 31, 3), jnp.float32)
    v_norm = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    eye = jnp.broadcast_to(jnp.eye(31), (200, 31, 31))
    h = jnp.concatenate([v_norm, eye], axis=-1)
    return h, x0, x1


def _unrolled_forward(apply_fn, params, h, x, v):
    """The reference benchmark's exact structure (speed.py:42-48): 30
    sequential applies in one jit, only the LAST chunk's x returned (so
    XLA dead-code-eliminates the other 29 — replicated identically for
    both sides; the measured quantity is one batch-100 forward)."""

    @jax.jit
    def forward(h, x, v):
        for idx in range(30):
            _h, _x, _v = apply_fn(params, h[idx], x[idx], v[idx])
        return _x

    return forward


def bench_nbody():
    rng = np.random.RandomState(0)
    h, x, v = _nbody_data(rng)

    sys.path.insert(0, "/root/reference")
    import sake

    from sake_tpu.compat import convert_reference_params
    from sake_tpu.models import SAKEModel

    ref_model = sake.models.DenseSAKEModel(
        hidden_features=64, out_features=1, depth=4, update=True
    )
    _mark("nbody: init reference model")
    ref_params = jax.jit(ref_model.init)(
        jax.random.PRNGKey(2666), h[0], x[0], v[0]
    )
    _mark("nbody: reference init done")
    our_model = SAKEModel(
        hidden_features=64, out_features=1, depth=4, update=True
    )
    our_params = convert_reference_params(ref_params)

    # --- parity: same function before timing (HIGHEST matmul precision —
    # at the TPU default, op-order differences between the two
    # implementations accumulate ~1e-3 through 4 position-update layers;
    # CPU-exact parity is CI's job, tests/test_reference_parity.py) -----
    with jax.default_matmul_precision("highest"):
        rh, rx, rv = jax.jit(ref_model.apply)(ref_params, h[0], x[0], v[0])
        oh, ox, ov = jax.jit(our_model.apply)(our_params, h[0], x[0], v[0])
    x_err = float(jnp.abs(ox - rx).max() / (jnp.abs(rx).max() + 1e-12))
    assert x_err < 1e-4, f"nbody parity broken: {x_err}"
    _mark(f"nbody parity ok ({x_err:.2e}); timing reference")

    f_ref = _unrolled_forward(ref_model.apply, ref_params, h, x, v)
    f_ours = _unrolled_forward(our_model.apply, our_params, h, x, v)
    f_kern, kern_gate = _nbody_kernel_leg(our_params, h, x, v)
    fns = [lambda: f_ref(h, x, v), lambda: f_ours(h, x, v)]
    if f_kern is not None:
        fns.append(lambda: f_kern(h, x, v))
    meds = _interleaved_medians(fns)
    t_ref, t_ours = meds[0] / 30.0, meds[1] / 30.0
    t_kern = meds[2] / 30.0 if f_kern is not None else None
    _mark(f"nbody interleaved: ref {t_ref:.5f} ours {t_ours:.5f} "
          f"kern {t_kern}")
    return t_ref, t_ours, x_err, t_kern, kern_gate


def _nbody_kernel_leg(our_params, h, x, v):
    """Kernel leg for the nbody forward (round-4 verdict item 5: measure
    it once at N=5 or write the closure — this measures it). The SAME
    velocity-model forward (``make_hidden_fn(want_x=True)`` consumes the
    real nbody velocities) under the reference benchmark's DCE'd
    30-apply structure. Gate before timing: predicted positions vs this
    file's own lax leg. Returns (jitted 30-apply fn or None, gate dict);
    the caller times it interleaved with the other legs."""
    interp = jax.default_backend() == "cpu"
    if interp and not os.environ.get("SAKE_HEADLINE_KERNEL_INTERPRET"):
        return None, {"skipped": "cpu backend (interpret-only)"}
    try:
        from sake_tpu.kernels import model_params_from_linen
        from sake_tpu.kernels.resid_ef import make_hidden_fn

        hx = make_hidden_fn(
            n_heads=4, update=True, batch_tile=4, pad_atoms=True,
            want_x=True,
            edge_matmul_dtype=None if interp else jnp.bfloat16,
            resid_dtype=jnp.float32 if interp else jnp.bfloat16,
            interpret=interp,
        )
        kp = model_params_from_linen(our_params)

        # parity gate: x_out of one batch-100 forward vs the lax leg
        from sake_tpu.models import SAKEModel

        model = SAKEModel(
            hidden_features=64, out_features=1, depth=4, update=True
        )
        _, x_l, _ = jax.jit(model.apply)(our_params, h[0], x[0], v[0])
        _, x_k = jax.jit(
            lambda p, h_, x_, v_: hx(p, h_, x_, v_, None)
        )(kp, h[0], x[0], v[0])
        rel = float(
            jnp.abs(x_k - x_l).max() / (jnp.abs(x_l).max() + 1e-12)
        )
        gate = {"x_rel": round(rel, 6)}
        if rel > (1e-4 if interp else 5e-2):
            gate["failed"] = True
            _mark(f"nbody kernel gate FAILED: {gate}")
            return None, gate

        @jax.jit
        def forward(h_, x_, v_):
            for i in range(30):
                _hf, _x = hx(kp, h_[i], x_[i], v_[i], None)
            return _x

        _mark(f"nbody kernel gate ok ({gate})")
        return forward, gate
    except Exception as ex:  # noqa: BLE001 — report, don't kill the bench
        if os.environ.get("SAKE_HEADLINE_STRICT") == "1":
            raise
        _mark(f"nbody kernel leg unavailable: {ex}")
        return None, {"error": str(ex).split("\n")[0][:160]}


def bench_motion():
    rng = np.random.RandomState(1)
    h, x0, x1 = _motion_data(rng)

    sys.path.insert(0, "/root/reference")
    import sake
    from flax.training.train_state import TrainState

    from sake_tpu.compat import convert_reference_params
    from sake_tpu.models import SAKEModel

    def make_step(model, params):
        # speed.py:36-45: full-batch MSE on predicted positions,
        # additive weight decay + adam(5e-4)
        def loss(p):
            _, x1_hat, __ = model.apply(p, h, x0)
            return ((x1_hat - x1) ** 2).mean()

        tx = optax.chain(
            # speed.py uses optax.additive_weight_decay (removed from
            # modern optax); add_decayed_weights is its renamed successor
            optax.add_decayed_weights(1e-10),
            optax.adam(learning_rate=0.0005),
        )
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx
        )

        @jax.jit
        def step(state):
            grads = jax.grad(loss)(state.params)
            return state.apply_gradients(grads=grads)

        def hundred(state=state):
            # their python loop over 100 steps; carried state forces
            # every step to execute
            s = state
            for _ in range(_MOTION_STEPS):
                s = step(s)
            return s.params

        return hundred

    ref_model = sake.models.DenseSAKEModel(
        hidden_features=64, out_features=1, depth=4, update=True
    )
    _mark("motion: init reference model")
    ref_params = jax.jit(ref_model.init)(jax.random.PRNGKey(2666), h, x0)
    _mark("motion: reference init done")
    our_model = SAKEModel(
        hidden_features=64, out_features=1, depth=4, update=True
    )
    our_params = convert_reference_params(ref_params)

    with jax.default_matmul_precision("highest"):
        _, rx, _ = jax.jit(ref_model.apply)(ref_params, h, x0)
        _, ox, _ = jax.jit(our_model.apply)(our_params, h, x0)
    x_err = float(jnp.abs(ox - rx).max() / (jnp.abs(rx).max() + 1e-12))
    assert x_err < 1e-4, f"motion parity broken: {x_err}"
    _mark(f"motion parity ok ({x_err:.2e}); timing reference")

    t_ref = _median_time(
        make_step(ref_model, ref_params), repeats=3
    ) / float(_MOTION_STEPS)
    _mark(f"motion reference {t_ref:.5f} s/step; timing ours")
    t_ours = _median_time(
        make_step(our_model, our_params), repeats=3
    ) / float(_MOTION_STEPS)
    t_kern, kern_gate = _motion_kernel_leg(our_params, h, x0, x1)
    return t_ref, t_ours, x_err, t_kern, kern_gate


def _motion_kernel_leg(our_params, h, x0, x1):
    """Third leg: the SAME full-batch position-MSE training step on the
    Pallas train kernels (``make_hidden_fn(want_x=True)`` — the gradient
    seeds enter through the x channel; reference workload shape:
    ``scripts/motion/speed.py:36-45``). Gate before timing: loss and
    parameter gradients vs this file's own lax leg (bf16 kernel tier).
    Returns (sec/step or None, gate dict)."""
    interp = jax.default_backend() == "cpu"
    if interp and not os.environ.get("SAKE_HEADLINE_KERNEL_INTERPRET"):
        return None, {"skipped": "cpu backend (interpret-only)"}
    try:
        from flax.training.train_state import TrainState

        from sake_tpu.kernels import model_params_from_linen
        from sake_tpu.kernels.resid_ef import make_hidden_fn

        hx = make_hidden_fn(
            n_heads=4, update=True, batch_tile=4, pad_atoms=True,
            want_x=True,
            edge_matmul_dtype=None if interp else jnp.bfloat16,
            resid_dtype=jnp.float32 if interp else jnp.bfloat16,
            interpret=interp,
        )
        kp0 = model_params_from_linen(our_params)
        v0 = jnp.zeros_like(x0)

        def loss_k(p):
            _, x1_hat = hx(p, h, x0, v0, None)
            return ((x1_hat - x1) ** 2).mean()

        def loss_l(p):
            from sake_tpu.models import SAKEModel

            model = SAKEModel(
                hidden_features=64, out_features=1, depth=4, update=True
            )
            _, x1_hat, _ = model.apply(p, h, x0)
            return ((x1_hat - x1) ** 2).mean()

        # --- parity gate: loss + param grads vs the lax leg ------------
        lk, gk = jax.jit(jax.value_and_grad(loss_k))(kp0)
        ll, gl = jax.jit(jax.value_and_grad(loss_l))(our_params)
        loss_rel = abs(float(lk) - float(ll)) / (abs(float(ll)) + 1e-12)
        g_oracle = model_params_from_linen(gl)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g_oracle), jax.tree.leaves(gk)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max()
            if scale < 1e-8:  # zero-oracle leaves (velocity gates etc.):
                # the kernel grad must ALSO be ~0 — a wiring bug putting
                # large spurious gradients on these leaves would otherwise
                # pass silently and then be adam-updated in the timed leg
                worst = max(worst, float(np.abs(b).max()))
                continue
            worst = max(worst, float(np.abs(b - a).max() / scale))
        gate = {"loss_rel": round(loss_rel, 6),
                "worst_grad_rel": round(worst, 6)}
        tol = 1e-4 if interp else 5e-2
        if loss_rel > tol or worst > (1e-3 if interp else 0.1):
            gate["failed"] = True
            _mark(f"motion kernel gate FAILED: {gate}")
            return None, gate

        tx = optax.chain(
            optax.add_decayed_weights(1e-10),
            optax.adam(learning_rate=0.0005),
        )
        state = TrainState.create(apply_fn=None, params=kp0, tx=tx)

        @jax.jit
        def step(state):
            grads = jax.grad(loss_k)(state.params)
            return state.apply_gradients(grads=grads)

        def hundred(state=state):
            s = state
            for _ in range(_MOTION_STEPS):
                s = step(s)
            return s.params

        _mark(f"motion kernel gate ok ({gate}); timing kernel leg")
        t_kern = _median_time(hundred, repeats=3) / float(_MOTION_STEPS)
        return t_kern, gate
    except Exception as ex:  # noqa: BLE001 — report, don't kill the bench
        # silent-regression guard: SAKE_HEADLINE_STRICT=1 re-raises so a
        # programming error (bad kwarg after a refactor) fails the bench
        # instead of dropping motion_kernel_speedup from the artifact
        if os.environ.get("SAKE_HEADLINE_STRICT") == "1":
            raise
        _mark(f"motion kernel leg unavailable: {ex}")
        return None, {"error": str(ex).split("\n")[0][:160]}


def main():
    nb_ref, nb_ours, nb_err, nb_kern, nb_gate = bench_nbody()
    mo_ref, mo_ours, mo_err, mo_kern, mo_gate = bench_motion()
    kern_fields = {}
    if mo_kern is not None:
        kern_fields = {
            "motion_step_sec_ours_kernel": round(mo_kern, 6),
            "motion_kernel_speedup": round(mo_ref / mo_kern, 3),
        }
    if nb_kern is not None:
        kern_fields.update({
            "nbody_forward_sec_ours_kernel": round(nb_kern, 6),
            "nbody_kernel_speedup": round(nb_ref / nb_kern, 3),
        })
    kern_fields["nbody_kernel_gate"] = nb_gate
    print(
        json.dumps(
            {
                "metric": "reference_headline_benchmarks_paired",
                "unit": "seconds (lower is better)",
                "nbody_forward_sec_reference": round(nb_ref, 6),
                "nbody_forward_sec_ours": round(nb_ours, 6),
                "nbody_speedup": round(nb_ref / nb_ours, 3),
                "nbody_parity_max_rel": nb_err,
                "motion_step_sec_reference": round(mo_ref, 6),
                "motion_step_sec_ours": round(mo_ours, 6),
                "motion_speedup": round(mo_ref / mo_ours, 3),
                "motion_parity_max_rel": mo_err,
                **kern_fields,
                "motion_kernel_gate": mo_gate,
                "notes": (
                    "reference = sake from /root/reference driven with its "
                    "own speed.py structure (nbody: speed.py:42-58; "
                    "motion: speed.py:66-73 with the commented-out jit "
                    "applied); ours = sake_tpu.SAKEModel carrying the "
                    "CONVERTED reference parameters (compat."
                    "convert_reference_params), parity-checked to fp32 "
                    "tier before timing. Synthetic data at the "
                    "reference's exact shapes. motion_..._kernel = the "
                    "same training step on the Pallas train kernels "
                    "(make_hidden_fn want_x=True), gradient-parity-gated "
                    "vs the lax leg before timing."
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
