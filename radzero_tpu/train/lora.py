"""LoRA adapters for functional param trees.

Rebuild of the reference's peft LoRA path (exp/cxr_pt/model/__init__.py:
82-114: LoraConfig + get_peft_model over target modules, adapter
checkpoint save/load at :42-45,100-107) in a form native to this
framework's pure-pytree design:

    effective_kernel = kernel + (alpha / r) * A @ B

Adapters live in a parallel pytree mirroring the targeted kernel leaves
(A ~ N(0, 1/r), B = 0 — so training starts at the base model exactly,
matching peft's init). ``merge_lora`` materialises effective kernels
right before the forward pass, so every model in the zoo gets LoRA with
zero model-code changes; differentiating through the merge trains only
the adapters. peft's adapter dropout is not replicated (merging folds
the adapter into the kernel; the reference default 0.05 is a minor
regulariser).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


def _iter_kernels(tree: dict, path=()):  # yields (path tuple, leaf)
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_kernels(v, path + (k,))
        elif k == "kernel":
            yield path + (k,), v


def _match(path: Tuple[str, ...], targets: List[str]) -> bool:
    joined = "/".join(path[:-1])  # drop the trailing 'kernel'
    return any(t in joined for t in targets)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    out = dict(tree)
    if len(path) == 1:
        out[path[0]] = value
    else:
        out[path[0]] = _set(tree[path[0]], path[1:], value)
    return out


def init_lora(
    key,
    params: dict,
    target_modules: List[str],
    r: int = 8,
    alpha: int = 32,
) -> dict:
    """Adapter tree: {'/'.join(path): {'a', 'b'}} for each targeted kernel.

    Handles both plain (d_in, d_out) kernels and scan-stacked
    (n_layers, d_in, d_out) kernels (per-layer adapters).
    """
    adapters: Dict[str, dict] = {}
    keys = jax.random.split(key, 1 + sum(1 for _ in _iter_kernels(params)))
    i = 0
    for path, kernel in _iter_kernels(params):
        i += 1
        if not _match(path, target_modules):
            continue
        shape = kernel.shape
        if len(shape) == 2:
            d_in, d_out = shape
            a = jax.random.normal(keys[i], (d_in, r), jnp.float32) / r
            b = jnp.zeros((r, d_out), jnp.float32)
        elif len(shape) == 3:
            n, d_in, d_out = shape
            a = jax.random.normal(keys[i], (n, d_in, r), jnp.float32) / r
            b = jnp.zeros((n, r, d_out), jnp.float32)
        else:
            continue
        adapters["/".join(path)] = {"a": a, "b": b}
    return {"adapters": adapters, "r": r, "alpha": alpha}


def merge_lora(params: dict, lora: dict) -> dict:
    """Return params with targeted kernels replaced by kernel + s * A @ B."""
    scaling = lora["alpha"] / lora["r"]
    out = params
    for joined, ab in lora["adapters"].items():
        path = tuple(joined.split("/"))
        kernel = _get(out, path)
        a, b = ab["a"], ab["b"]
        delta = jnp.einsum("...ir,...ro->...io", a, b) * scaling
        out = _set(out, path, kernel + delta.astype(kernel.dtype))
    return out


def lora_trainable(lora: dict) -> dict:
    """The differentiable subtree (drop the static r/alpha)."""
    return {"adapters": lora["adapters"]}


def with_trainable(lora: dict, trainable: dict) -> dict:
    return {**lora, "adapters": trainable["adapters"]}


def save_adapter(lora: dict, path: str) -> None:
    """Persist only the adapter weights + hyperparams (the peft
    adapter-checkpoint equivalent, ref model/__init__.py:42-45,100-107)."""
    import os

    import orbax.checkpoint as ocp

    from radzero_tpu.utils.json_io import save_json

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "adapters"), lora["adapters"])
    ckptr.wait_until_finished()
    save_json({"r": lora["r"], "alpha": lora["alpha"]}, os.path.join(path, "lora_config.json"))


def load_adapter(path: str, target_lora: dict) -> dict:
    """Restore adapters shaped like ``target_lora`` (from init_lora)."""
    import os

    import orbax.checkpoint as ocp

    from radzero_tpu.utils.json_io import load_json

    ckptr = ocp.StandardCheckpointer()
    adapters = ckptr.restore(
        os.path.join(os.path.abspath(path), "adapters"), target_lora["adapters"]
    )
    conf = load_json(os.path.join(path, "lora_config.json"))
    return {"adapters": adapters, "r": conf["r"], "alpha": conf["alpha"]}
