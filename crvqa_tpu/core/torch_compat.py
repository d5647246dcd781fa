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

from typing import Any, Optional, Sequence

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
            # Dense (in, out) -> (out, in); Conv HWIO -> OIHW
            leaf = "weight"
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
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


def torch_state_dict_to_flax(state: dict[str, Any], template: PyTree,
                             missing: str = "raise") -> PyTree:
    """Inverse mapping: fill a flax param template from a torch state_dict.

    `template` provides the tree structure + shapes; any torch tensor values
    are converted to numpy. `missing="raise"` raises KeyError listing absent
    names; `missing="keep"` keeps the template's value for them (the
    `load_state_dict(strict=False)` analogue the mPLUG checkpoint import
    needs, `mPLUG/vqa_mplug.py:373`). Conv kernels (4-D) translate
    OIHW <-> HWIO rather than the Dense transpose.
    """
    tree, absent, _ = _torch_state_dict_to_flax_report(state, template)
    if absent and missing == "raise":
        raise KeyError(f"missing keys in torch state_dict: {absent[:10]}"
                       f"{'...' if len(absent) > 10 else ''}")
    return tree


def _torch_state_dict_to_flax_report(
        state: dict[str, Any], template: PyTree,
) -> tuple[PyTree, list[str], list[str]]:
    """(filled tree, missing torch names, used torch names)."""
    from flax import traverse_util

    def to_np(v):
        if hasattr(v, "detach"):  # Parameters from module pickles carry grad
            v = v.detach()
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    flat = traverse_util.flatten_dict(template)
    out = {}
    missing = []
    used = []
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
            out[path] = np.asarray(value)
            continue
        used.append(name)
        arr = to_np(state[name]).astype(np.asarray(value).dtype)
        if transpose:
            # torch Linear (out, in) -> flax Dense (in, out); torch Conv
            # OIHW -> flax HWIO
            arr = arr.transpose(2, 3, 1, 0) if arr.ndim == 4 else arr.T
        if leaf == "weight_g":
            arr = arr.reshape(np.asarray(value).shape)
        if arr.shape != np.asarray(value).shape:
            raise ValueError(f"{name}: shape {arr.shape} != {np.asarray(value).shape}")
        out[path] = arr
    return traverse_util.unflatten_dict(out), missing, used


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


# ------------------------------------------- mPLUG pretrained-checkpoint import
#
# The reference initializes mPLUG from a downloaded torch checkpoint
# (`mPLUG/vqa_mplug.py:338-376`): `model`/`module` unwrap, a bilinear
# positional-embedding resize for the configured image resolution
# (`models/visual_transformers.py:resize_pos_embed`, :19-38), a
# `fusion.`/`bert.` key-rename shim for pretraining-format checkpoints, and
# `load_state_dict(strict=False)`. The functions below reproduce that
# pipeline into our flax MPlug tree (models/mplug/mplug.py) so `--init_ckpt
# mplug_base.pth` starts training from the published weights.

_MPLUG_TOWERS = ("visual_encoder", "text_encoder", "fusion_encoder",
                 "text_decoder", "visn_fc", "visn_layer_norm")


def resize_pos_embed_np(pos: np.ndarray, new_len: int) -> np.ndarray:
    """`models/visual_transformers.py:resize_pos_embed` (:19-38): keep the
    class token, bilinearly resize the square patch grid. Uses torch
    F.interpolate(bilinear) exactly like the reference (torch is sanctioned
    in this module)."""
    if pos.shape[0] == new_len:
        return pos
    torch = _torch()
    import torch.nn.functional as F

    tok = np.asarray(pos[:1], np.float32)
    grid = np.asarray(pos[1:], np.float32)
    gs_old = int(round(len(grid) ** 0.5))
    gs_new = int(round((new_len - 1) ** 0.5))
    g = torch.from_numpy(np.ascontiguousarray(grid))
    g = g.reshape(1, gs_old, gs_old, -1).permute(0, 3, 1, 2)
    g = F.interpolate(g, size=(gs_new, gs_new), mode="bilinear")
    g = g.permute(0, 2, 3, 1).reshape(gs_new * gs_new, -1).numpy()
    return np.concatenate([tok, g], 0)


def strip_fusion_bert_keys(sd: dict[str, Any]) -> dict[str, Any]:
    """The reference's pretraining-format key shim, replicated with its exact
    dict semantics (`vqa_mplug.py:367-371`): for every key containing
    'fusion' or 'bert' but not 'decode', re-key at
    `key.replace('fusion.', '').replace('bert.', '')` — including the quirk
    that a key whose replacement equals itself is DELETED (set-then-del on
    the same name)."""
    sd = dict(sd)
    for key in list(sd.keys()):
        if ("fusion" in key or "bert" in key) and "decode" not in key:
            encoder_key = key.replace("fusion.", "").replace("bert.", "")
            sd[encoder_key] = sd[key]
            del sd[key]
    return sd


def _mplug_remap_key(key: str) -> Optional[str]:
    """Reference torch parameter name -> the generic torch-style name of our
    flax MPlug tree (what `flax_to_torch_state_dict` would emit for it), or
    None for parameters our model has no analogue of (CLIP text tower /
    `visual.proj` under skip_last_layer / tied `cls.predictions.decoder` /
    position_ids buffers / beam_generator)."""
    if key.startswith("visual_encoder."):
        rest = key[len("visual_encoder."):]
        if not rest.startswith("visual."):
            return None  # CLIP text transformer / logit_scale — unused
        rest = rest[len("visual."):]
        if rest == "proj":
            return None  # skip_last_layer=True never applies the projection
        rest = rest.replace("transformer.resblocks.", "resblocks.")
        # the generic torch-name derivation splits trailing digits
        # (ln_1 -> ln.1); align the CLIP names with it
        rest = rest.replace(".ln_1.", ".ln.1.")
        rest = rest.replace(".ln_2.", ".ln.2.")
        rest = rest.replace(".attn.in_proj_weight", ".attn_in_proj.weight")
        rest = rest.replace(".attn.in_proj_bias", ".attn_in_proj.bias")
        rest = rest.replace(".attn.out_proj.", ".attn_out_proj.")
        rest = rest.replace(".mlp.c_fc.", ".mlp_c_fc.")
        rest = rest.replace(".mlp.c_proj.", ".mlp_c_proj.")
        return "visual_encoder." + rest
    for tower in ("text_encoder.", "fusion_encoder."):
        if key.startswith(tower):
            rest = key[len(tower):]
            if rest.startswith("encoder.layer."):
                rest = "layer." + rest[len("encoder.layer."):]
            if rest.endswith("position_ids"):
                return None
            return tower + rest
    if key.startswith("text_decoder."):
        rest = key[len("text_decoder."):]
        if rest.startswith("bert.embeddings."):
            rest = "embeddings." + rest[len("bert.embeddings."):]
        elif rest.startswith("bert.encoder.layer."):
            rest = "layer." + rest[len("bert.encoder.layer."):]
        elif rest == "cls.predictions.bias":
            rest = "predictions_bias"
        elif rest.startswith("cls.predictions.transform.dense."):
            rest = ("predictions_transform_dense."
                    + rest[len("cls.predictions.transform.dense."):])
        elif rest.startswith("cls.predictions.transform.LayerNorm."):
            rest = ("predictions_transform_LayerNorm."
                    + rest[len("cls.predictions.transform.LayerNorm."):])
        elif rest.startswith("cls.predictions.decoder"):
            return None  # tied to word_embeddings (BertEmbeddings.attend)
        if rest.endswith("position_ids"):
            return None
        return "text_decoder." + rest
    if key.startswith(("visn_fc.", "visn_layer_norm.")):
        return key  # ViT-L 'large' adapter (model_vqa_mplug.py:143-147)
    return None


def load_mplug_torch_checkpoint(
        path: str, template: PyTree, template_m: Optional[PyTree] = None,
        pretrain_format: bool = True,
) -> tuple[PyTree, Optional[PyTree], dict[str, list]]:
    """Load a reference-format mPLUG torch checkpoint into our flax tree.

    Reproduces `mPLUG/vqa_mplug.py:338-376`: `model`/`module` unwrap,
    bilinear pos-embed resize to the template's resolution + the
    `fusion.`/`bert.` pretraining-format shim (both only when
    `pretrain_format`, mirroring the reference's
    `not evaluate and not do_mask` gate), then a strict=False fill of the
    main tree and (when the checkpoint carries `_m` momentum twins and
    `template_m` is given) the twin tree.

    Returns (params, params_m or None, report) where report lists
    `missing` template leaves the checkpoint didn't cover and `unused`
    checkpoint keys nothing consumed — the analogue of the reference's
    printed `load_state_dict` msg.
    """
    torch = _torch()
    try:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        raw = {"model": module_pickle_state_dict(path)}
    if isinstance(raw, dict) and ("model" in raw or "module" in raw):
        # exact reference order: try checkpoint['model'] first (:339-342)
        sd = raw.get("model", raw.get("module"))
    else:
        sd = raw.state_dict() if hasattr(raw, "state_dict") else raw

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach()
        return v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    sd = {k: to_np(v) for k, v in sd.items()}

    from flax import traverse_util

    if pretrain_format:
        # pos-embed resize to the template resolution (:345-365), main +
        # twin, BEFORE the key shim (reference order; the key is unaffected
        # by the shim either way)
        flat_t = traverse_util.flatten_dict(template)
        new_len = np.asarray(
            flat_t[("visual_encoder", "positional_embedding")]).shape[0]
        for k in ("visual_encoder.visual.positional_embedding",
                  "visual_encoder_m.visual.positional_embedding"):
            if k in sd:
                sd[k] = resize_pos_embed_np(np.asarray(sd[k], np.float32),
                                            new_len)
        sd = strip_fusion_bert_keys(sd)

    main, twin = {}, {}
    unmapped = []
    for k, v in sd.items():
        tower = k.split(".", 1)[0]
        if tower.endswith("_m") and tower[:-2] in _MPLUG_TOWERS:
            g = _mplug_remap_key(tower[:-2] + k[len(tower):])
            (twin.__setitem__(g, v) if g else unmapped.append(k))
        else:
            g = _mplug_remap_key(k)
            (main.__setitem__(g, v) if g else unmapped.append(k))

    params, missing, used = _torch_state_dict_to_flax_report(main, template)
    report = {"missing": missing,
              "unused": sorted(set(main) - set(used)) + unmapped}
    params_m = None
    if template_m is not None and twin:
        params_m, missing_m, used_m = _torch_state_dict_to_flax_report(
            twin, template_m)
        report["missing_m"] = missing_m
        report["unused"] += sorted(set(twin) - set(used_m))
    return params, params_m, report
