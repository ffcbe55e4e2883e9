"""One-time converter: reference PyTorch checkpoints (.pth) -> ultra_tpu
parameter pytrees (and orbax-ready numpy trees).

Checkpoint layout of the reference (verified on ckpts/ultra_3g.pth;
load paths run.py:256-258, run_query.py:226-233):

  {"model": state_dict, "optimizer": ...}
  relation_model.layers.{i}.layer_norm.{weight,bias}
  relation_model.layers.{i}.linear.{weight,bias}        # torch (out, in)
  relation_model.layers.{i}.relation.weight             # (4, 64)
  entity_model.layers.{i}.layer_norm.{weight,bias}
  entity_model.layers.{i}.linear.{weight,bias}
  entity_model.layers.{i}.relation_projection.{0,2}.{weight,bias}
  entity_model.mlp.{0,2}.{weight,bias}

UltraQuery checkpoints nest the same under "model.model.*".

torch is used only here (CPU, host-side); nothing in the compute path
imports it.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if isinstance(state, dict) and "model" in state else state
    # UltraQuery nests the Ultra weights under model.model.* (RelationProjection
    # wraps Ultra wraps the nbfnets; run_query.py:226-233) — strip every
    # uniform "model." prefix level
    while sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model.") :]: v for k, v in sd.items()}
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _linear(sd, prefix):
    return {
        "w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),  # (in, out)
        "b": sd[f"{prefix}.bias"],
    }


def _num_layers(sd, model):
    idx = set()
    pat = re.compile(rf"^{model}\.layers\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return max(idx) + 1 if idx else 0


def _convert_nbfnet(sd: Dict[str, np.ndarray], model: str) -> dict:
    params = {"layers": []}
    for i in range(_num_layers(sd, model)):
        p = f"{model}.layers.{i}"
        layer = {"linear": _linear(sd, f"{p}.linear")}
        if f"{p}.layer_norm.weight" in sd:
            layer["layer_norm"] = {
                "scale": sd[f"{p}.layer_norm.weight"],
                "bias": sd[f"{p}.layer_norm.bias"],
            }
        if f"{p}.relation.weight" in sd:
            layer["relation"] = sd[f"{p}.relation.weight"]
        if f"{p}.relation_projection.0.weight" in sd:
            layer["relation_projection"] = {
                "w1": np.ascontiguousarray(sd[f"{p}.relation_projection.0.weight"].T),
                "b1": sd[f"{p}.relation_projection.0.bias"],
                "w2": np.ascontiguousarray(sd[f"{p}.relation_projection.2.weight"].T),
                "b2": sd[f"{p}.relation_projection.2.bias"],
            }
        if f"{p}.relation_linear.weight" in sd:
            layer["relation_linear"] = _linear(sd, f"{p}.relation_linear")
        params["layers"].append(layer)

    # scoring / concat-hidden MLP: torch Sequential indices 0, 2, 4, ...
    mlp = []
    j = 0
    while f"{model}.mlp.{j}.weight" in sd:
        mlp.append(_linear(sd, f"{model}.mlp.{j}"))
        j += 2
    if mlp:
        params["mlp"] = mlp
    return params


def convert_ultra_checkpoint(path: str) -> dict:
    """Load a reference .pth and return the ultra_tpu parameter pytree
    {"relation_model": ..., "entity_model": ...} as numpy arrays."""
    sd = _to_numpy_state_dict(path)
    return {
        "relation_model": _convert_nbfnet(sd, "relation_model"),
        "entity_model": _convert_nbfnet(sd, "entity_model"),
    }


def _export_nbfnet(params: dict, model: str, sd: Dict[str, np.ndarray]) -> None:
    for i, layer in enumerate(params["layers"]):
        p = f"{model}.layers.{i}"
        sd[f"{p}.linear.weight"] = np.ascontiguousarray(
            np.asarray(layer["linear"]["w"]).T
        )
        sd[f"{p}.linear.bias"] = np.asarray(layer["linear"]["b"])
        if "layer_norm" in layer:
            sd[f"{p}.layer_norm.weight"] = np.asarray(layer["layer_norm"]["scale"])
            sd[f"{p}.layer_norm.bias"] = np.asarray(layer["layer_norm"]["bias"])
        if "relation" in layer:
            sd[f"{p}.relation.weight"] = np.asarray(layer["relation"])
        if "relation_projection" in layer:
            rp = layer["relation_projection"]
            sd[f"{p}.relation_projection.0.weight"] = np.ascontiguousarray(
                np.asarray(rp["w1"]).T
            )
            sd[f"{p}.relation_projection.0.bias"] = np.asarray(rp["b1"])
            sd[f"{p}.relation_projection.2.weight"] = np.ascontiguousarray(
                np.asarray(rp["w2"]).T
            )
            sd[f"{p}.relation_projection.2.bias"] = np.asarray(rp["b2"])
        if "relation_linear" in layer:
            sd[f"{p}.relation_linear.weight"] = np.ascontiguousarray(
                np.asarray(layer["relation_linear"]["w"]).T
            )
            sd[f"{p}.relation_linear.bias"] = np.asarray(
                layer["relation_linear"]["b"]
            )
    for j, lin in enumerate(params.get("mlp", [])):
        sd[f"{model}.mlp.{2 * j}.weight"] = np.ascontiguousarray(
            np.asarray(lin["w"]).T
        )
        sd[f"{model}.mlp.{2 * j}.bias"] = np.asarray(lin["b"])


def export_ultra_checkpoint(params: dict, path: str, nest_levels: int = 0) -> None:
    """Inverse of convert_ultra_checkpoint: write an ultra_tpu parameter
    pytree as a reference-layout .pth ({"model": state_dict}, torch
    Sequential naming, (out, in) linear weights — run.py:256-258), so a
    model trained here loads straight into the reference code (or back into
    convert_ultra_checkpoint). nest_levels=2 reproduces the UltraQuery
    layout, whose state-dict keys carry a "model.model." prefix
    (RelationProjection wraps Ultra wraps the nbfnets,
    run_query.py:226-233)."""
    import torch

    sd: Dict[str, np.ndarray] = {}
    _export_nbfnet(params["relation_model"], "relation_model", sd)
    _export_nbfnet(params["entity_model"], "entity_model", sd)
    prefix = "model." * nest_levels
    tensors = {
        prefix + k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()
    }
    torch.save({"model": tensors}, path)


def to_jax(tree):
    import jax.numpy as jnp

    return _map_arrays(tree, jnp.asarray)


def _map_arrays(tree, fn):
    if isinstance(tree, dict):
        return {k: _map_arrays(v, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_arrays(v, fn) for v in tree)
    return fn(tree)
