"""Optimizer chains with NaN containment.

Packages the optimization patterns the reference harnesses hand-rolled:

- warmup-cosine LR schedule (``scripts/md17/run.py:108-113``),
- ``optax.apply_if_finite`` skip-nonfinite updates with an abort threshold
  (``scripts/qm9_full/run.py:149,160``),
- ``optax.zero_nans`` gradient scrubbing (``scripts/ani/run_tpu.py:111``),
- optional gradient clipping and weight decay.
"""

from __future__ import annotations

from typing import Optional

import optax


def warmup_cosine_schedule(
    peak_lr: float,
    total_steps: int,
    warmup_frac: float = 0.1,
    end_lr: float = 0.0,
) -> optax.Schedule:
    """Linear warmup to ``peak_lr`` then cosine decay to ``end_lr``."""
    warmup_steps = max(1, int(total_steps * warmup_frac))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=end_lr,
    )


def make_optimizer(
    learning_rate,
    *,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = None,
    zero_nans: bool = False,
    if_finite_patience: Optional[int] = 5,
) -> optax.GradientTransformation:
    """Adam(W) chain with the reference's NaN-containment semantics.

    ``if_finite_patience``: wrap in ``optax.apply_if_finite`` — non-finite
    updates are skipped; after this many *consecutive* non-finite steps the
    inner state is considered poisoned (callers can abort via
    ``notfinite_count``). ``None`` disables the wrapper.
    """
    chain = []
    if zero_nans:
        chain.append(optax.zero_nans())
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(learning_rate))
    tx = optax.chain(*chain)
    if if_finite_patience is not None:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=if_finite_patience)
    return tx


def notfinite_count(opt_state) -> int:
    """Consecutive non-finite update count from an ``apply_if_finite`` state
    (the abort signal of ``scripts/qm9_full/run.py:160``). Returns 0 when
    the wrapper is absent."""
    if hasattr(opt_state, "notfinite_count"):
        return int(opt_state.notfinite_count)
    return 0
