"""torch checkpoint <-> flax variables conversion.

A torch ``state_dict`` key like ``seq.3.list.0.1.convs.1.3.weight`` maps
mechanically onto our flax module tree: alpha tokens grouped with their
following index tokens become flax module names (``seq_3 / list_0_1 /
convs_1_3``), and leaves translate as

    conv weight (O, I, kh, kw)  <->  kernel (kh, kw, I, O)
    linear weight (O, I)        <->  kernel (I, O)
    BN weight/bias              <->  scale/bias          (params)
    BN running_mean/var         <->  mean/var            (batch_stats)
    num_batches_tracked         ->   dropped

This one rule imports every backbone (hourglass, MiDaS v2, monodepth2)
because the flax modules are named to mirror the torch layouts
(reference checkpoints: monodepth/mannequin_challenge_model.py:29-32,
midas_v2_model.py:32-39, monodepth2_model.py:26-29).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

FlaxVars = Dict[str, Any]


def _flax_path(torch_key: str) -> Tuple[Tuple[str, ...], str]:
    """('seq.3.list.0.1.convs.1.3.weight') ->
    (('seq_3', 'list_0_1', 'convs_1_3'), 'weight')"""
    tokens = torch_key.split(".")
    leaf = tokens[-1]
    groups = []
    cur = None
    for tok in tokens[:-1]:
        if tok.isdigit():
            if cur is None:
                cur = tok
            else:
                cur += "_" + tok
        else:
            if cur is not None:
                groups.append(cur)
            cur = tok
    if cur is not None:
        groups.append(cur)
    return tuple(groups), leaf


def _set(tree: dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, Mapping) or p not in node:
            return None
        node = node[p]
    return node


def state_dict_to_variables(
    state_dict: Mapping[str, np.ndarray],
    template: FlaxVars,
    strip_prefixes: Tuple[str, ...] = ("module.", "model."),
    strict: bool = True,
) -> FlaxVars:
    """Convert a torch state_dict (values as numpy arrays) into flax
    ``{'params': ..., 'batch_stats': ...}`` matching ``template``'s tree.

    ``strip_prefixes`` handles DataParallel-style wrapping.
    """
    params: dict = {}
    batch_stats: dict = {}
    used = set()

    for key, value in state_dict.items():
        k = key
        for pre in strip_prefixes:
            if k.startswith(pre):
                k = k[len(pre):]
        if k.endswith("num_batches_tracked"):
            continue
        path, leaf = _flax_path(k)
        # deep copy: jnp.asarray is zero-copy on CPU, so without this
        # the flax variables would alias live torch storage and torch's
        # in-place BN running-stat updates would silently mutate them
        value = np.array(value)

        if leaf == "running_mean":
            _set(batch_stats, path + ("mean",), value)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), value)
        elif leaf == "weight":
            # decide conv vs linear vs BN-scale by template lookup
            if _get(template.get("params", {}), path + ("kernel",)) is not None:
                if value.ndim == 4:
                    value = value.transpose(2, 3, 1, 0)
                elif value.ndim == 2:
                    value = value.transpose(1, 0)
                _set(params, path + ("kernel",), value)
            elif _get(template.get("params", {}), path + ("scale",)) is not None:
                _set(params, path + ("scale",), value)
            elif strict:
                raise KeyError(f"No template slot for torch key '{key}' "
                               f"(path {path})")
            else:
                continue
        elif leaf == "bias":
            _set(params, path + ("bias",), value)
        elif strict:
            raise KeyError(f"Unhandled torch leaf '{leaf}' in key '{key}'")
        used.add(k)

    out: FlaxVars = {"params": params}
    if batch_stats or "batch_stats" in template:
        out["batch_stats"] = batch_stats

    if strict:
        _check_same_structure(template, out)
    return out


def _iter_leaves(tree, prefix=()):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _iter_leaves(v, prefix + (k,))
    else:
        yield prefix, tree


def _check_same_structure(template: FlaxVars, imported: FlaxVars) -> None:
    for coll in template:
        t_leaves = dict(_iter_leaves(template.get(coll, {})))
        i_leaves = dict(_iter_leaves(imported.get(coll, {})))
        missing = set(t_leaves) - set(i_leaves)
        extra = set(i_leaves) - set(t_leaves)
        if missing or extra:
            raise ValueError(
                f"[{coll}] import mismatch.\n  missing: {sorted(missing)[:8]}"
                f"\n  extra: {sorted(extra)[:8]}")
        for path, tv in t_leaves.items():
            iv = i_leaves[path]
            if tuple(np.shape(tv)) != tuple(np.shape(iv)):
                raise ValueError(
                    f"[{coll}] shape mismatch at {path}: template "
                    f"{np.shape(tv)} vs import {np.shape(iv)}")


def variables_to_state_dict(
    variables: FlaxVars,
    conv_paths_hint: Mapping[str, int] | None = None,
) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax variables -> a torch-layout state_dict
    (numpy values), used to write ``.pth``-compatible checkpoints."""
    out: Dict[str, np.ndarray] = {}

    def torch_key(path, leaf):
        comps = []
        for comp in path:
            # split trailing index tokens: 'uncertainty_layer_0' ->
            # ['uncertainty_layer', '0']; 'list_0_1' -> ['list', '0', '1']
            parts = comp.split("_")
            n_idx = 0
            while n_idx < len(parts) - 1 and parts[-1 - n_idx].isdigit():
                n_idx += 1
            base = "_".join(parts[: len(parts) - n_idx])
            comps.extend([base] + parts[len(parts) - n_idx:])
        return ".".join(comps + [leaf])

    for path, value in _iter_leaves(variables.get("params", {})):
        *mods, leaf = path
        value = np.asarray(value)
        if leaf == "kernel":
            if value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)
            elif value.ndim == 2:
                value = value.transpose(1, 0)
            out[torch_key(mods, "weight")] = value
        elif leaf == "scale":
            out[torch_key(mods, "weight")] = value
        elif leaf == "bias":
            out[torch_key(mods, "bias")] = value
        else:
            out[torch_key(mods, leaf)] = value

    for path, value in _iter_leaves(variables.get("batch_stats", {})):
        *mods, leaf = path
        name = {"mean": "running_mean", "var": "running_var"}.get(leaf, leaf)
        out[torch_key(mods, name)] = np.asarray(value)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` file into {key: numpy array} (torch CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd and not any(
        hasattr(v, "numpy") for v in sd.values()
    ):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = v  # e.g. monodepth2 encoder.pth carries height/width
    return out


def save_torch_checkpoint(path: str, variables: FlaxVars) -> None:
    """Write a torch-loadable ``.pth`` state_dict from flax variables."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in variables_to_state_dict(variables).items()
    }
    torch.save(sd, path)
