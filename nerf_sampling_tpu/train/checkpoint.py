"""Checkpointing: native .npz pytree snapshots + torch-``.tar`` interop.

Native format: one flat .npz per checkpoint holding every pytree leaf in
flatten order plus the global step — fast, dependency-free, resume-exact
(params AND optimizer state round-trip).

Torch interop (reference format, utils.py:59-122): import reads the
reference's ``{step:06d}.tar`` files so reference-pretrained NeRFs /
DepthNets seed training here; export writes a torch-loadable .tar with the
same keys (``global_step``, ``network_fn_state_dict``,
``network_fine_state_dict``, ``depth_network``, ``optimizer_state_dict``,
``sampling_optimizer_state_dict``) so models trained here load in the
reference. Optimizer *moments* do not cross the torch boundary (different
optimizer state layouts); step/lr scheduling state does.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


# --------------------------------------------------------------------------
# Native .npz checkpoints
# --------------------------------------------------------------------------


def save_checkpoint(path: str, tree: Any, step: int) -> None:
    """Save a pytree + step to .npz, keyed by tree path strings.

    Key-based (not order-based) storage lets a later load restore any
    structural subtree (e.g. params-only without optimizer state).
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {
        "tree:" + jax.tree_util.keystr(p): np.asarray(leaf) for p, leaf in flat
    }
    arrays["global_step"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str, template: Any, partial: bool = False) -> tuple[Any, int]:
    """Restore ``template``'s leaves from a save_checkpoint .npz by path key.

    The template may be a structural subtree of what was saved (extra saved
    keys are ignored). With ``partial=True``, template leaves missing from
    the file keep their template values instead of raising.
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "tree:" + jax.tree_util.keystr(p)
        if key in data:
            leaves.append(data[key])
        elif partial:
            leaves.append(leaf)
        else:
            raise KeyError(f"checkpoint {path} is missing leaf {key}")
    step = int(data["global_step"])
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def find_checkpoints(dirpath: str, pattern: str = r"\.(npz|tar)$") -> list[str]:
    """Sorted checkpoint paths in a directory (reference nerf_utils.py:451-458
    sorts by filename; zero-padded step names keep that correct).

    Same-step tie-break: the native ``.npz`` sorts AFTER the ``.tar`` export
    so resume (which takes the last entry) picks the checkpoint that also
    carries optimizer moments — plain lexical order would pick the .tar and
    silently downgrade an exact resume to a params-only one.
    """
    if not os.path.isdir(dirpath):
        return []
    return [
        os.path.join(dirpath, f)
        for f in sorted(
            (f for f in os.listdir(dirpath) if re.search(pattern, f)),
            key=lambda f: (os.path.splitext(f)[0], f.endswith(".npz")),
        )
    ]


# --------------------------------------------------------------------------
# Torch interop
# --------------------------------------------------------------------------


def _t2np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _linear_from_torch(sd: dict, prefix: str) -> dict[str, np.ndarray]:
    """torch Linear [out, in] -> ours [in, out]."""
    return {
        "weight": _t2np(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _t2np(sd[f"{prefix}.bias"]),
    }


def nerf_params_from_torch(sd: dict) -> dict:
    """Map a reference NeRF state_dict to our param pytree
    (names from run_nerf_helpers.py:87-107)."""
    n_pts = len({k.split(".")[1] for k in sd if k.startswith("pts_linears.")})
    params: dict = {
        "pts_linears": [_linear_from_torch(sd, f"pts_linears.{i}") for i in range(n_pts)]
    }
    if "feature_linear.weight" in sd:
        params["feature_linear"] = _linear_from_torch(sd, "feature_linear")
        params["alpha_linear"] = _linear_from_torch(sd, "alpha_linear")
        n_views = len(
            {k.split(".")[1] for k in sd if k.startswith("views_linears.")}
        )
        params["views_linears"] = [
            _linear_from_torch(sd, f"views_linears.{i}") for i in range(n_views)
        ]
        params["rgb_linear"] = _linear_from_torch(sd, "rgb_linear")
    else:
        params["output_linear"] = _linear_from_torch(sd, "output_linear")
    return params


def depth_net_params_from_torch(sd: dict) -> dict:
    """Map a reference DepthNet state_dict (depth_net.py:103-107) to ours.

    cat_layers is an nn.Sequential with LeakyReLU at odd indices, so only
    even indices carry weights; to_depth is [Linear, Sigmoid] -> index 0.
    """

    def tower(name: str) -> list[dict]:
        idxs = sorted(
            {int(k.split(".")[1]) for k in sd if k.startswith(f"{name}.")}
        )
        return [_linear_from_torch(sd, f"{name}.{i}") for i in idxs]

    return {
        "origin_layers": tower("origin_layers"),
        "direction_layers": tower("direction_layers"),
        "intersection_layers": tower("intersection_layers"),
        "cat_layers": tower("cat_layers"),  # odd (activation) indices have no keys
        "to_depth": _linear_from_torch(sd, "to_depth.0"),
    }


def import_torch_checkpoint(path: str) -> dict:
    """Read a reference ``.tar`` checkpoint (format: utils.py:79-88).

    Returns {"global_step", "nerf_coarse", "nerf_fine"|None, "depth"|None}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out: dict[str, Any] = {"global_step": int(ckpt.get("global_step", 0))}
    if ckpt.get("network_fn_state_dict"):
        out["nerf_coarse"] = nerf_params_from_torch(ckpt["network_fn_state_dict"])
    out["nerf_fine"] = (
        nerf_params_from_torch(ckpt["network_fine_state_dict"])
        if ckpt.get("network_fine_state_dict")
        else None
    )
    out["depth"] = (
        depth_net_params_from_torch(ckpt["depth_network"])
        if ckpt.get("depth_network")
        else None
    )
    return out


def nerf_params_from_keras(weights: list, D: int = 8) -> dict:
    """Import original-TF-NeRF Keras weight lists
    (reference NeRF.load_weights_from_keras, run_nerf_helpers.py:136-183).

    Keras stores Dense kernels as [in, out] — our native layout, so no
    transpose. Layout: [W0, b0, W1, b1, ...] for pts_linears, then
    feature_linear, views_linears[0], rgb_linear, alpha_linear.
    """
    def lin(i):
        return {
            "weight": np.asarray(weights[i], np.float32),
            "bias": np.asarray(weights[i + 1], np.float32).reshape(-1),
        }

    params = {"pts_linears": [lin(2 * i) for i in range(D)]}
    params["feature_linear"] = lin(2 * D)
    params["views_linears"] = [lin(2 * D + 2)]
    params["rgb_linear"] = lin(2 * D + 4)
    params["alpha_linear"] = lin(2 * D + 6)
    return params


def _linear_to_torch(p: dict, prefix: str, sd: dict) -> None:
    import torch

    sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["weight"]).T.copy())
    sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())


def nerf_params_to_torch(params: dict) -> dict:
    sd: dict = {}
    for i, layer in enumerate(params["pts_linears"]):
        _linear_to_torch(layer, f"pts_linears.{i}", sd)
    if "feature_linear" in params:
        _linear_to_torch(params["feature_linear"], "feature_linear", sd)
        _linear_to_torch(params["alpha_linear"], "alpha_linear", sd)
        for i, layer in enumerate(params["views_linears"]):
            _linear_to_torch(layer, f"views_linears.{i}", sd)
        _linear_to_torch(params["rgb_linear"], "rgb_linear", sd)
    else:
        _linear_to_torch(params["output_linear"], "output_linear", sd)
    return sd


def depth_net_params_to_torch(params: dict) -> dict:
    sd: dict = {}
    for name in ("origin_layers", "direction_layers", "intersection_layers"):
        for i, layer in enumerate(params[name]):
            _linear_to_torch(layer, f"{name}.{i}", sd)
    for i, layer in enumerate(params["cat_layers"]):
        _linear_to_torch(layer, f"cat_layers.{2 * i}", sd)  # LeakyReLU at odd idx
    _linear_to_torch(params["to_depth"], "to_depth.0", sd)
    return sd


def _adam_state_dict(n_params: int, lr: float, state: dict | None = None) -> dict:
    """A torch-Adam-loadable optimizer state dict.

    ``state`` maps torch param index -> {"step", "exp_avg", "exp_avg_sq"};
    empty (fresh start) when the moments are unknown (e.g. depth-net-mode
    checkpoints never step the frozen NeRF's optimizer — exactly the
    reference's situation, Trainer.py:538-543)."""
    return {
        "state": state or {},
        "param_groups": [
            {
                "lr": lr,
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": None,
                "params": list(range(n_params)),
            }
        ],
    }


def _nerf_param_order(params: dict) -> list[str]:
    """state_dict key names in the reference NeRF's ``parameters()`` order
    (module attribute assignment order, run_nerf_helpers.py:87-106:
    pts_linears, views_linears, feature_linear, alpha_linear, rgb_linear) —
    torch Adam keys its per-param state by position in this sequence."""
    if "feature_linear" not in params:
        # The torch module's parameters() includes an always-registered
        # views_linears (run_nerf_helpers.py:96) that a non-viewdirs tree
        # has no moments for — callers must export a fresh optimizer
        # instead (see export_torch_checkpoint).
        raise ValueError(
            "Adam-moment export is only defined for use_viewdirs=True params"
        )
    names = [f"pts_linears.{i}" for i in range(len(params["pts_linears"]))]
    names += [f"views_linears.{i}" for i in range(len(params["views_linears"]))]
    names += ["feature_linear", "alpha_linear", "rgb_linear"]
    return [f"{n}.{wb}" for n in names for wb in ("weight", "bias")]


def _depth_param_order(params: dict) -> list[str]:
    """Reference DepthNet ``parameters()`` order (depth_net.py:103-107:
    origin_layers, direction_layers, intersection_layers, cat_layers,
    to_depth; Sequential skips the parameter-free LeakyReLU/Sigmoid)."""
    names = []
    for tower in ("origin_layers", "direction_layers", "intersection_layers"):
        names += [f"{tower}.{i}" for i in range(len(params[tower]))]
    names += [f"cat_layers.{2 * i}" for i in range(len(params["cat_layers"]))]
    names += ["to_depth.0"]
    return [f"{n}.{wb}" for n in names for wb in ("weight", "bias")]


def _find_adam_moments(opt_state):
    """(count, mu, nu) from an optax adam chain's state tuple."""
    for el in opt_state:
        if hasattr(el, "mu") and hasattr(el, "nu"):
            return el.count, el.mu, el.nu
    raise ValueError("no ScaleByAdamState found in opt_state")


def _adam_moments_to_torch(opt_state, sections) -> dict:
    """optax adam moments -> torch Adam per-param state.

    ``sections``: list of (param_order_names, mu_subtree, nu_subtree) in
    the torch optimizer's param-group order (e.g. coarse then fine for the
    reference's joint grad_vars, nerf_utils.py:417-430). Moment tensors are
    laid out exactly like their params, so the same name/transpose mapping
    used for the weights (nerf_params_to_torch and friends) applies —
    optax mu/nu map 1:1 to torch exp_avg/exp_avg_sq, and optax's count is
    torch's per-param "step" (identical bias-correction formulas at
    b1=0.9 / b2=0.999 / eps=1e-8).
    """
    import torch

    count, _, _ = _find_adam_moments(opt_state)
    step_value = float(np.asarray(count))
    state: dict = {}
    idx = 0
    for names, mu_sd, nu_sd in sections:
        for nm in names:
            state[idx] = {
                "step": torch.tensor(step_value),
                "exp_avg": mu_sd[nm],
                "exp_avg_sq": nu_sd[nm],
            }
            idx += 1
    return state


def export_torch_checkpoint(
    path: str,
    step: int,
    nerf_coarse: dict,
    nerf_fine: dict | None = None,
    depth: dict | None = None,
    lrate: float = 5e-4,
    depth_net_lr: float = 1e-4,
    nerf_opt_state=None,
    depth_opt_state=None,
    lrate_decay: int = 250,
) -> None:
    """Write a reference-format .tar (utils.py:79-88 keys) loadable by torch.

    When the live optax optimizer states are passed, their Adam moments
    round-trip into the torch Adam state dicts (SURVEY §7: optimizer state
    "must round-trip on export for resume parity"), so a torch-side resume
    of our checkpoint continues with warm moments instead of silently
    restarting Adam. ``nerf_opt_state`` covers coarse+fine jointly (the
    reference's single optimizer over concatenated grad_vars,
    nerf_utils.py:417-442); its mu/nu pytrees must be NeRFParams-shaped.
    The exported lr is the reference's decayed value at ``step``
    (Trainer.py:546-551), matching what a reference-side save would hold.
    """
    import torch

    coarse_sd = nerf_params_to_torch(nerf_coarse)
    n_nerf = len(coarse_sd)
    data: dict[str, Any] = {
        "global_step": step,
        "network_fn_state_dict": coarse_sd,
    }
    if nerf_fine is not None:
        fine_sd = nerf_params_to_torch(nerf_fine)
        data["network_fine_state_dict"] = fine_sd
        n_nerf += len(fine_sd)
    nerf_state = None
    decayed_lr = lrate * 0.1 ** (step / (lrate_decay * 1000))
    if nerf_opt_state is not None and "feature_linear" not in nerf_coarse:
        # use_viewdirs=False: the reference module registers views_linears
        # UNCONDITIONALLY (run_nerf_helpers.py:96, before the use_viewdirs
        # branch), so its parameters() order contains two tensors our
        # non-viewdirs tree doesn't have — positional Adam-state keying is
        # ill-defined. Export a fresh optimizer instead of a misaligned one
        # (the reference's depth path asserts use_viewdirs anyway,
        # run_nerf_helpers.py:137).
        nerf_opt_state = None
    if nerf_opt_state is not None:
        _, mu, nu = _find_adam_moments(nerf_opt_state)
        sections = [
            (
                _nerf_param_order(nerf_coarse),
                nerf_params_to_torch(mu.coarse),
                nerf_params_to_torch(nu.coarse),
            )
        ]
        if nerf_fine is not None:
            sections.append(
                (
                    _nerf_param_order(nerf_fine),
                    nerf_params_to_torch(mu.fine),
                    nerf_params_to_torch(nu.fine),
                )
            )
        nerf_state = _adam_moments_to_torch(nerf_opt_state, sections)
    data["optimizer_state_dict"] = _adam_state_dict(
        n_nerf, decayed_lr, nerf_state
    )
    depth_sd = depth_net_params_to_torch(depth) if depth is not None else {}
    data["depth_network"] = depth_sd
    depth_state = None
    if depth_opt_state is not None and depth is not None:
        _, dmu, dnu = _find_adam_moments(depth_opt_state)
        depth_state = _adam_moments_to_torch(
            depth_opt_state,
            [
                (
                    _depth_param_order(depth),
                    depth_net_params_to_torch(dmu),
                    depth_net_params_to_torch(dnu),
                )
            ],
        )
    data["sampling_optimizer_state_dict"] = _adam_state_dict(
        len(depth_sd), depth_net_lr, depth_state
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(data, path)
