"""Checkpoint save/restore (orbax) + PyTorch ``.pth`` import.

Reference behaviour: save best-accuracy ``state_dict`` to
``./ckpt/.../{net}{num}_tmp.pth`` (cifar100_train_eval.py:316-319), load via
``load_state_dict(torch.load(dir), False)`` (:159).  Here: orbax for native
checkpoints of the full train state, plus a structural converter that maps a
torch ``state_dict`` onto our flax param/batch-stat trees so the reference's
pretrained zoo can be evaluated directly.

The converter matches by *ordered traversal*, not by name: both the torch
models and our flax models declare layers in the same order (the models were
built to preserve reference layer ordering — SURVEY.md §7.4), so the k-th
conv kernel / bn scale / dense kernel in torch's state_dict corresponds to
the k-th one in the flattened flax tree.  Shapes are transposed
(OIHW -> HWIO, [out,in] -> [in,out]) and verified; any mismatch raises.
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------


def save(path: str, state) -> None:
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(p, state, force=True)


def restore(path: str, template=None):
    import orbax.checkpoint as ocp

    p = pathlib.Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(p)
        return ckptr.restore(p, args=ocp.args.PyTreeRestore(template))


# ---------------------------------------------------------------------------
# Torch .pth import
# ---------------------------------------------------------------------------


def _flatten_with_path(tree):
    """Flatten nested dicts in *insertion order* (flax init order == module
    call order, which matches the torch registration order for this zoo —
    jax's tree_flatten would sort keys alphabetically and scramble it)."""
    out = []

    def walk(node, keys):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, keys + (k,))
        else:
            out.append((keys, node))

    walk(tree, ())
    return out


def _torch_entries(state_dict):
    """Classify torch state_dict entries in declaration order."""
    entries = []
    for name, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        if name.endswith("num_batches_tracked"):
            continue
        leaf = name.rsplit(".", 1)[-1]
        entries.append((name, leaf, arr))
    return entries


def import_torch_state_dict(state_dict, variables, *, strict: bool = True):
    """Map a torch state_dict onto flax ``{"params":..., "batch_stats":...}``.

    Matching is positional within four streams: conv kernels (4-D weights),
    dense kernels (2-D weights), biases+BN scales (1-D, matched jointly in
    order), and BN running stats.  Returns new variables.

    ``variables`` MUST be the raw dict from ``model.init`` — its insertion
    order is the module call order that the positional match relies on.  A
    jax pytree round-trip (eval_shape, tree.map, device_put of the dict)
    sorts keys alphabetically and would scramble the correspondence.
    """
    tflat = _torch_entries(state_dict)

    # Build ordered stream of torch tensors by role.
    t_convs = [a for (_, leaf, a) in tflat if leaf == "weight" and a.ndim == 4]
    t_dense = [a for (_, leaf, a) in tflat if leaf == "weight" and a.ndim == 2]
    t_bn_scale = [a for (n, leaf, a) in tflat
                  if leaf == "weight" and a.ndim == 1]
    t_bias = [a for (n, leaf, a) in tflat if leaf == "bias"]
    t_mean = [a for (n, leaf, a) in tflat if leaf == "running_mean"]
    t_var = [a for (n, leaf, a) in tflat if leaf == "running_var"]

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    new_params = _assign_params(params, t_convs, t_dense, t_bn_scale, t_bias,
                                strict=strict)
    new_stats = _assign_stats(batch_stats, t_mean, t_var, strict=strict)
    out = {"params": new_params}
    if batch_stats:
        out["batch_stats"] = new_stats
    return out


def _assign_params(params, t_convs, t_dense, t_bn_scale, t_bias, *, strict):
    flat = _flatten_with_path(params)
    consumed = {"conv": 0, "dense": 0, "scale": 0, "bias": 0}
    new_leaves = {}
    for keys, leaf in flat:
        kind = keys[-1]
        if kind == "kernel" and leaf.ndim == 4:
            src = t_convs[consumed["conv"]]; consumed["conv"] += 1
            arr = np.transpose(src, (2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "kernel" and leaf.ndim == 2:
            src = t_dense[consumed["dense"]]; consumed["dense"] += 1
            arr = np.transpose(src, (1, 0))  # [out,in] -> [in,out]
        elif kind == "scale":
            arr = t_bn_scale[consumed["scale"]]; consumed["scale"] += 1
        elif kind == "bias":
            arr = t_bias[consumed["bias"]]; consumed["bias"] += 1
        else:
            raise ValueError(f"unexpected param leaf {keys}")
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(map(str, keys))}: "
                f"torch {arr.shape} vs flax {leaf.shape}")
        new_leaves[keys] = jnp.asarray(arr, leaf.dtype)
    if strict:
        for k, n_avail in (("conv", len(t_convs)), ("dense", len(t_dense)),
                           ("scale", len(t_bn_scale)), ("bias", len(t_bias))):
            if consumed[k] != n_avail:
                raise ValueError(
                    f"{k}: consumed {consumed[k]} of {n_avail} torch tensors")
    return _unflatten_like(params, new_leaves)


def _assign_stats(batch_stats, t_mean, t_var, *, strict):
    if not batch_stats:
        return batch_stats
    flat = _flatten_with_path(batch_stats)
    im = iv = 0
    new_leaves = {}
    for keys, leaf in flat:
        kind = keys[-1]
        if kind == "mean":
            arr = t_mean[im]; im += 1
        elif kind == "var":
            arr = t_var[iv]; iv += 1
        else:
            raise ValueError(f"unexpected batch_stats leaf {keys}")
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {keys}: {arr.shape} vs {leaf.shape}")
        new_leaves[keys] = jnp.asarray(arr, leaf.dtype)
    if strict and (im != len(t_mean) or iv != len(t_var)):
        raise ValueError(f"bn stats: consumed {im}/{len(t_mean)} means, "
                         f"{iv}/{len(t_var)} vars")
    return _unflatten_like(batch_stats, new_leaves)


def _unflatten_like(tree, new_leaves: dict):
    def walk(node, keys):
        if isinstance(node, dict):
            return {k: walk(v, keys + (k,)) for k, v in node.items()}
        return new_leaves[keys]

    return walk(tree, ())


def export_torch_state_dict(variables, template_state_dict):
    """Inverse of :func:`import_torch_state_dict`: fill a torch model's
    ``state_dict`` (used as a shape/order template) with our flax variables.

    Enables training in this framework and evaluating the identical weights
    in the reference PyTorch models (the oracle direction needed by the
    statistical PTQ-accuracy harness, and the export path for torch-serving
    users).  Same positional four-stream correspondence as import; shapes are
    transposed back (HWIO -> OIHW, [in,out] -> [out,in]) and verified.

    Returns a ``{name: np.ndarray}`` dict loadable via
    ``tmodel.load_state_dict({k: torch.from_numpy(v) ...})``.
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    j_convs, j_dense, j_scale, j_bias = [], [], [], []
    for keys, leaf in _flatten_with_path(params):
        kind = keys[-1]
        arr = np.asarray(leaf, dtype=np.float32)
        if kind == "kernel" and arr.ndim == 4:
            j_convs.append(np.transpose(arr, (3, 2, 0, 1)))  # HWIO -> OIHW
        elif kind == "kernel" and arr.ndim == 2:
            j_dense.append(np.transpose(arr, (1, 0)))  # [in,out] -> [out,in]
        elif kind == "scale":
            j_scale.append(arr)
        elif kind == "bias":
            j_bias.append(arr)
        else:
            raise ValueError(f"unexpected param leaf {keys}")
    j_mean, j_var = [], []
    for keys, leaf in _flatten_with_path(batch_stats):
        kind = keys[-1]
        arr = np.asarray(leaf, dtype=np.float32)
        if kind == "mean":
            j_mean.append(arr)
        elif kind == "var":
            j_var.append(arr)
        else:
            raise ValueError(f"unexpected batch_stats leaf {keys}")

    consumed = {"conv": 0, "dense": 0, "scale": 0, "bias": 0,
                "mean": 0, "var": 0}
    out = {}
    for name, t in template_state_dict.items():
        tmpl = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)
        leaf = name.rsplit(".", 1)[-1]
        if leaf == "num_batches_tracked":
            out[name] = tmpl  # not tracked on our side; keep template value
            continue
        if leaf == "weight" and tmpl.ndim == 4:
            arr = j_convs[consumed["conv"]]; consumed["conv"] += 1
        elif leaf == "weight" and tmpl.ndim == 2:
            arr = j_dense[consumed["dense"]]; consumed["dense"] += 1
        elif leaf == "weight" and tmpl.ndim == 1:
            arr = j_scale[consumed["scale"]]; consumed["scale"] += 1
        elif leaf == "bias":
            arr = j_bias[consumed["bias"]]; consumed["bias"] += 1
        elif leaf == "running_mean":
            arr = j_mean[consumed["mean"]]; consumed["mean"] += 1
        elif leaf == "running_var":
            arr = j_var[consumed["var"]]; consumed["var"] += 1
        else:
            raise ValueError(f"unexpected torch state_dict entry {name}")
        if arr.shape != tmpl.shape:
            raise ValueError(f"shape mismatch at {name}: "
                             f"ours {arr.shape} vs torch {tmpl.shape}")
        out[name] = arr
    for kind, avail in (("conv", len(j_convs)), ("dense", len(j_dense)),
                        ("scale", len(j_scale)), ("bias", len(j_bias)),
                        ("mean", len(j_mean)), ("var", len(j_var))):
        if consumed[kind] != avail:
            raise ValueError(
                f"{kind}: torch template consumed {consumed[kind]} of "
                f"{avail} flax tensors")
    return out


def load_pth(path: str, variables, *, strict: bool = True):
    """torch.load a .pth file (CPU) and import it (reference :158-159)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_state_dict(sd, variables, strict=strict)
