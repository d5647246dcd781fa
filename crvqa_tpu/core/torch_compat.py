"""Stage-boundary artifact interop with the PyTorch reference.

The real API of the reference codebase is its checkpoint files (SURVEY.md §1):
  - `mask.pt`: dict {torch_module_name + '.weight': BoolTensor}
    (`mask_trainer_Robust_VQA.py:943-991`)
  - `classifier4masker.bin`: the classifier module
    (`mask_trainer_Robust_VQA.py:734-740`) — we emit its state_dict and read
    either form (whole-module pickles load without the reference class
    definitions via the stub unpickler below; the tensor payload is
    identical)
  - stage-1 whole-model pickles — read as state_dicts, class-free.

Orientation: torch Linear weight is (out, in); flax Dense kernel is
(in, out) -> transpose on both export and import. Embeddings keep (vocab,
hidden) on both sides. torch is CPU-only here and used purely for
(de)serialization — never in the compute path.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from ..masking.spec import MaskSpec

PyTree = Any


def _torch():
    import torch

    return torch


# ------------------------------------------------------------------- mask.pt

def export_mask_pt(path: str, masks: dict[str, np.ndarray],
                   specs: Sequence[MaskSpec]) -> None:
    """Write masks (keyed by spec.key, flax orientation) as a reference-format
    `mask.pt` keyed by `<torch_name>.weight` bool tensors. Process-0-gated
    (masks are host/replicated — no gather needed)."""
    import jax

    if jax.process_index() != 0:
        return
    torch = _torch()
    out = {}
    for spec in specs:
        m = np.asarray(masks[spec.key]).astype(bool)
        if spec.stacked:
            # stacked [L, in, out] -> per-layer torch entries (the template
            # torch_name carries the '{}' layer slot)
            for i in range(spec.stacked):
                out[f"{spec.torch_name.format(i)}.weight"] = torch.from_numpy(
                    np.ascontiguousarray(m[i].T))
            continue
        if not spec.is_embedding:
            m = m.T  # flax (in, out) -> torch (out, in)
        out[f"{spec.torch_name}.weight"] = torch.from_numpy(m)
    torch.save(out, path)


def import_mask_pt(path: str, specs: Sequence[MaskSpec]) -> dict[str, np.ndarray]:
    """Read a reference `mask.pt` back into spec.key-keyed flax orientation."""
    torch = _torch()
    raw = torch.load(path, map_location="cpu", weights_only=False)
    masks = {}
    for spec in specs:
        if spec.stacked:
            layers = [raw[f"{spec.torch_name.format(i)}.weight"].numpy()
                      .astype(bool).T for i in range(spec.stacked)]
            masks[spec.key] = np.stack(layers)
            continue
        t = raw[f"{spec.torch_name}.weight"]
        m = t.numpy().astype(bool)
        if not spec.is_embedding:
            m = m.T
        masks[spec.key] = m
    return masks


# -------------------------------------------------------- param dict interop

def flax_to_torch_state_dict(params: PyTree, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a flax param tree to torch state_dict naming.

    Rules: `layer_3` -> `layer.3` (and r_layers/x_layers/main); Dense
    `kernel` -> `weight` transposed; `Embed.embedding` -> `weight`;
    LayerNorm `scale` -> `weight`; WeightNormDense `v`/`g` ->
    `weight_v` (transposed) / `weight_g`.
    """
    from flax import traverse_util

    out = {}
    flat = traverse_util.flatten_dict(params)
    for path, value in flat.items():
        arr = np.asarray(value)
        parts = []
        for p in path[:-1]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit():
                stem, idx = p.rsplit("_", 1)
                parts.extend([stem, idx])
            else:
                parts.append(p)
        leaf = path[-1]
        if leaf == "kernel":
            leaf, arr = "weight", arr.T
        elif leaf == "embedding":
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        elif leaf == "v":
            leaf, arr = "weight_v", arr.T
        elif leaf == "g":
            leaf, arr = "weight_g", arr.reshape(())
        name = ".".join(([prefix] if prefix else []) + parts + [leaf])
        out[name] = arr
    return out


def torch_state_dict_to_flax(state: dict[str, Any], template: PyTree) -> PyTree:
    """Inverse mapping: fill a flax param template from a torch state_dict.

    `template` provides the tree structure + shapes; any torch tensor values
    are converted to numpy. Raises KeyError listing missing names.
    """
    from flax import traverse_util

    def to_np(v):
        if hasattr(v, "detach"):  # Parameters from module pickles carry grad
            v = v.detach()
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    flat = traverse_util.flatten_dict(template)
    out = {}
    missing = []
    for path, value in flat.items():
        parts = []
        for p in path[:-1]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit():
                stem, idx = p.rsplit("_", 1)
                parts.extend([stem, idx])
            else:
                parts.append(p)
        leaf = path[-1]
        transpose = False
        if leaf == "kernel":
            leaf, transpose = "weight", True
        elif leaf == "embedding":
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        elif leaf == "v":
            leaf, transpose = "weight_v", True
        elif leaf == "g":
            leaf = "weight_g"
        name = ".".join(parts + [leaf])
        if name not in state:
            missing.append(name)
            continue
        arr = to_np(state[name]).astype(np.asarray(value).dtype)
        if transpose:
            arr = arr.T
        if leaf == "weight_g":
            arr = arr.reshape(np.asarray(value).shape)
        if arr.shape != np.asarray(value).shape:
            raise ValueError(f"{name}: shape {arr.shape} != {np.asarray(value).shape}")
        out[path] = arr
    if missing:
        raise KeyError(f"missing keys in torch state_dict: {missing[:10]}"
                       f"{'...' if len(missing) > 10 else ''}")
    return traverse_util.unflatten_dict(out)


def export_classifier_bin(path: str, classifier_params: PyTree) -> None:
    """Save the classifier as a torch state_dict pickle with the reference's
    `classifier.main.{0,3}` naming (`classifier4masker.bin` contract, module
    pickle replaced by its state_dict). Process-0-gated (classifier params
    are replicated)."""
    import jax

    if jax.process_index() != 0:
        return
    torch = _torch()
    # classifier_params = {'main_0': ..., 'main_3': ...} -> 'main.0.*'/'main.3.*'
    sd = flax_to_torch_state_dict(classifier_params)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               path)


def import_classifier_bin(path: str, template: PyTree) -> PyTree:
    """Load `classifier4masker.bin` (our state_dict export or a reference
    whole-module pickle — readable with or without the reference class
    definitions on path, via the stub unpickler)."""
    torch = _torch()
    try:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        raw = module_pickle_state_dict(path)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    return torch_state_dict_to_flax(raw, template)


# ----------------------------------------- stub-class whole-module unpickling
#
# The reference's stage-1 checkpoints are `torch.save(model)` WHOLE-MODULE
# pickles (`mask_trainer_Robust_VQA.py:748-755`), as is `classifier4masker
# .bin` (:734-740). Unpickling those normally requires the reference class
# definitions (`hg_transformers.modeling_lxmert.LxmertForMultipleChoice`,
# `masking.maskers_Robust.MaskedLinear1`, ...) on sys.path. The stub loader
# below fabricates a state-capturing stand-in class for ANY class outside a
# small allowlist (torch / builtins / collections / ...), then walks the
# reconstructed module tree's `_parameters`/`_buffers`/`_modules` dicts into
# a flat state_dict — so a reference user's .bin files load with no
# reference code installed.

_STUB_ALLOWED_ROOTS = frozenset(
    {"torch", "builtins", "collections", "copyreg", "numpy", "_codecs",
     "functools", "argparse",
     # py2-era names in protocol<=2 GLOBAL opcodes (torch pickles sets as
     # `__builtin__.set`); super().find_class maps them via fix_imports
     "__builtin__", "copy_reg"})
_stub_class_cache: dict[tuple, type] = {}


class _StubObject:
    """Reconstruction target for unpickled classes we refuse to import.

    Tolerates every default-protocol shape: NEWOBJ/REDUCE construction args
    are accepted and ignored; state lands in __dict__ (dict state, or the
    (dict, slots) pair of protocol-2 objects with __slots__)."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            state = {**(d or {}), **(slots or {})}
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    cls = _stub_class_cache.get(key)
    if cls is None:
        cls = type(name, (_StubObject,), {"__module__": module})
        _stub_class_cache[key] = cls
    return cls


def _stub_pickle_module():
    """A `pickle_module` for torch.load whose Unpickler resolves only
    allowlisted roots and stubs everything else. torch's own serialization
    wraps this Unpickler (storage/persistent-id handling stays torch's)."""
    import pickle
    import types

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".", 1)[0] in _STUB_ALLOWED_ROOTS:
                return super().find_class(module, name)
            return _stub_class(module, name)

    # a real module object: torch.serialization reads pickle_module.__name__
    mod = types.ModuleType("crvqa_stub_pickle")
    mod.Unpickler = StubUnpickler
    mod.load = lambda f, **kw: StubUnpickler(f, **kw).load()
    mod.loads = lambda s, **kw: StubUnpickler(__import__("io").BytesIO(s),
                                              **kw).load()
    # torch probes these on legacy-format paths
    mod.Pickler = pickle.Pickler
    mod.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
    return mod


def _walk_module_state(obj: Any, prefix: str, out: dict) -> None:
    """nn.Module.state_dict recursion over a (possibly stubbed) module tree:
    `_parameters` + persistent `_buffers` tensors, recurse into `_modules`.
    Works on real torch modules and `_StubObject`s alike (both keep those
    dicts in instance __dict__). Divergence from state_dict(): modules with
    a `get_extra_state()` hook would contribute `_extra_state` entries we
    cannot reproduce (the stub has no methods) — no reference module has
    one."""
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for name, t in (d.get("_parameters") or {}).items():
        if t is not None:
            out[prefix + name] = t
    non_persistent = d.get("_non_persistent_buffers_set") or ()
    for name, t in (d.get("_buffers") or {}).items():
        if t is not None and name not in non_persistent:
            out[prefix + name] = t
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            _walk_module_state(child, prefix + name + ".", out)


def module_pickle_state_dict(path: str) -> dict[str, Any]:
    """torch.load ANY checkpoint (whole-module pickle or state_dict) without
    importing its classes; return a flat {torch_name: tensor} state_dict.

    A uniform `module.` prefix (DataParallel-wrapped saves) is stripped."""
    raw = _torch().load(path, map_location="cpu",
                        pickle_module=_stub_pickle_module(),
                        weights_only=False)
    if isinstance(raw, dict):
        state = dict(raw)
    else:
        state = {}
        _walk_module_state(raw, "", state)
        if not state:
            raise ValueError(
                f"{path}: unpickled object of type {type(raw).__name__} "
                "carries no _parameters/_buffers/_modules tree")
    if state and all(k.startswith("module.") for k in state):
        state = {k[len("module."):]: v for k, v in state.items()}
    return state


# ------------------------------------------------- checkpoint load/save shims

def load_torch_params(path: str, template: PyTree) -> PyTree:
    """Load a reference-side checkpoint (`.bin`/`.pt`/`.pth`: whole-module
    pickle or plain state_dict) into a flax param tree. The single torch
    entry point for the CLI stage-1-checkpoint loaders (CLAUDE.md: torch
    stays out of everything but this module / evals.scoring / tests).

    Whole-module pickles load even when their class definitions are NOT
    importable (the usual case: reference checkpoints, no reference code
    installed) via the stub unpickler above."""
    torch = _torch()
    try:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        raw = module_pickle_state_dict(path)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    return torch_state_dict_to_flax(raw, template)


def save_torch_state_dict(path: str, params: PyTree) -> None:
    """torch.save a flax param tree as a reference-named state_dict (the
    stage-1 -> stage-2/3 interop artifact). Process-0-gated (params are
    replicated)."""
    import jax

    if jax.process_index() != 0:
        return
    torch = _torch()
    sd = flax_to_torch_state_dict(params)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)


def save_torch_pickle(path: str, obj: Any) -> bool:
    """torch.save an arbitrary object (.pth artifacts like target_count);
    returns False when torch is unavailable so callers can fall back."""
    try:
        _torch().save(obj, path)
        return True
    except ImportError:
        return False


def load_torch_pickle(path: str) -> Any:
    """torch.load an arbitrary .pth artifact (target_count annotations etc).
    Raises ImportError when torch is unavailable — callers outside the
    sanctioned torch locations (CLAUDE.md) route ALL torch reads through
    here so the boundary stays greppable."""
    return _torch().load(path, map_location="cpu", weights_only=False)


def load_mask_dict_bool(path: str) -> dict[str, np.ndarray]:
    """mask.pt -> {torch_name: bool ndarray} (compare_mask consumption)."""
    raw = _torch().load(path, map_location="cpu", weights_only=False)
    return {k: v.numpy().astype(bool) for k, v in raw.items()}
