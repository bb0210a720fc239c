"""Reference-checkpoint compatibility.

Converts parameter pytrees produced by the reference SAKE library
(ArnNag/sake, flax linen) into sake_tpu's parameter structure, so
reference-trained checkpoints can be loaded and so parity tests can compare
the two implementations on identical weights.

Name mapping (reference -> sake_tpu); ``layers_k`` are flax ``nn.Sequential``
children, whose indices skip activation entries (hence ``k // 2``):

===================================  ==================================
reference path                       sake_tpu path
===================================  ==================================
``d{i}``                             ``layer_{i}``
``<mlp>.layers_k`` (2-Dense MLPs)    ``<mlp>.dense_{k//2}``
``semantic_attention_mlp.layers_0``  ``semantic_mlp`` (unwrapped)
``x_mixing.layers_0``                ``x_mixing`` (unwrapped)
``velocity_mlp.layers_0``            ``velocity_mlp_hidden``
``velocity_mlp.layers_2``            ``velocity_mlp_out``
``sake_model`` (flow conditioner)    ``conditioner``
``scale_mlp.layers_0``               ``scale_dense_in``
``scale_mlp.layers_2``               ``scale_dense_out``
``edge_model.layers_0`` (EGNN gate)  ``edge_gate`` (unwrapped)
``edge_att.layers_0`` (EGNN gate)    ``edge_gate`` (unwrapped)
===================================  ==================================

Flow couplings: the reference's ``xv_{i}``/``vx_{i}`` per-layer subtrees
are stacked into the single scanned ``couplings`` stack (leading axis
``2*depth`` in forward application order ``[xv_{D-1}, vx_{D-1}, ...,
xv_0, vx_0]`` — see ``flows.AugmentedFlowModel``).

Everything else (``embedding_in``, ``edge_model`` CFConv children,
``v_mixing``, ``log_gamma``, leaf arrays) passes through unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Mapping


def _is_sequential(tree: Any) -> bool:
    return (
        isinstance(tree, Mapping)
        and len(tree) > 0
        and all(re.fullmatch(r"layers_\d+", k) for k in tree)
    )


def _sequential_to_mlp(tree: Mapping) -> dict:
    return {
        f"dense_{int(k.split('_')[1]) // 2}": convert_reference_params(v)
        for k, v in tree.items()
    }


# reference name -> (sake_tpu name(s), handler)
_UNWRAP_SINGLE = {
    "semantic_attention_mlp": "semantic_mlp",
    "x_mixing": "x_mixing",
}
_SPLIT_PAIR = {
    "velocity_mlp": ("velocity_mlp_hidden", "velocity_mlp_out"),
    "scale_mlp": ("scale_dense_in", "scale_dense_out"),
}
_RENAME = {"sake_model": "conditioner"}


def _stack_flow_couplings(tree: Mapping) -> dict:
    """Stack the reference flow's per-layer ``xv_i``/``vx_i`` subtrees into
    the scanned ``couplings`` parameter stack (forward application order)."""
    import jax
    import jax.numpy as jnp

    depth = sum(1 for k in tree if re.fullmatch(r"xv_\d+", k))
    ordered = []
    for i in reversed(range(depth)):
        ordered.append(convert_reference_params(tree[f"xv_{i}"]))
        ordered.append(convert_reference_params(tree[f"vx_{i}"]))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ordered)


def convert_reference_params(tree: Any) -> Any:
    """Recursively convert a reference param (sub)tree to sake_tpu naming."""
    if not isinstance(tree, Mapping):
        return tree
    if any(re.fullmatch(r"xv_\d+", k) for k in tree):
        out = {
            k: convert_reference_params(v)
            for k, v in tree.items()
            if not re.fullmatch(r"(xv|vx)_\d+", k)
        }
        out["couplings"] = _stack_flow_couplings(tree)
        return out
    out: dict = {}
    for k, v in tree.items():
        m = re.fullmatch(r"d(\d+)", k)
        if m:
            out[f"layer_{m.group(1)}"] = convert_reference_params(v)
        elif k in _SPLIT_PAIR and _is_sequential(v):
            hidden_name, out_name = _SPLIT_PAIR[k]
            out[hidden_name] = convert_reference_params(v["layers_0"])
            out[out_name] = convert_reference_params(v["layers_2"])
        elif k in _UNWRAP_SINGLE and _is_sequential(v):
            out[_UNWRAP_SINGLE[k]] = convert_reference_params(v["layers_0"])
        elif k in ("edge_model", "edge_att") and _is_sequential(v):
            # EGNN sigmoid edge gate (a 1-Dense Sequential); the CFConv
            # edge_model has named children and is handled generically.
            out["edge_gate"] = convert_reference_params(v["layers_0"])
        elif _is_sequential(v):
            out[_RENAME.get(k, k)] = _sequential_to_mlp(v)
        else:
            out[_RENAME.get(k, k)] = convert_reference_params(v)
    return out
