"""Run /root/reference PyTorch code as a numerics oracle inside tests.

The reference imports cleanly under the baked-in CPU torch given two tiny
module stubs (`sentencepiece` and `torch._six`) plus a CPU-safe `.cuda()`
no-op (the reference masker calls `threshold.cuda()` unconditionally,
`masking/maskers_Robust.py:362`). Parity tests transplant flax params into
the reference modules via `core.torch_compat.flax_to_torch_state_dict` and
assert logits/loss/mask equality — converting the suite's self-captured
goldens into actual cross-implementation evidence (VERDICT r2 item 1).

Everything here is test-only; the compute path never touches torch
(CLAUDE.md conventions).
"""
from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE = "/root/reference"
_installed = False


def install():
    """Make `/root/reference` importable; returns the torch module."""
    global _installed
    # py3.12/numpy>=1.24 removed aliases the reference touches at runtime
    # (collections.Mapping/Sequence in data_collator.py:91-93, np.float in
    # mask_trainer_Robust_VQA.py:794); restore them additively
    import collections
    import collections.abc

    import numpy as _np

    for name in ("Mapping", "Sequence", "Iterable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("object", object)):
        if not hasattr(_np, alias):
            setattr(_np, alias, typ)
    if "sentencepiece" not in sys.modules:
        sp = types.ModuleType("sentencepiece")
        sp.SentencePieceProcessor = object
        sp.__spec__ = importlib.util.spec_from_loader("sentencepiece",
                                                      loader=None)
        sys.modules["sentencepiece"] = sp
    import torch

    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        sys.modules["torch._six"] = six
    if not _installed:
        # reference code calls .cuda() on tensors/modules with no CPU guard;
        # map it to identity for this (test) process
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        _installed = True
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # data-layer deps the trainer module chain imports but never touches in
    # the oracle paths (dataset_LXM.py:15-24 pulls utils_vqa/zarr/h5py)
    for name in ("utils_vqa", "zarr", "tensorboardX", "h5py"):
        sys.modules.setdefault(name, types.ModuleType(name))
    return torch


def install_mplug():
    """install() + the symbol shims `mPLUG/models/modeling_mplug.py` needs
    under the baked-in pip transformers (4.57 moved the chunking/prune
    helpers from modeling_utils to pytorch_utils)."""
    torch = install()
    import transformers.modeling_utils as mu
    from transformers import pytorch_utils as pu

    for n in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
              "prune_linear_layer"):
        if not hasattr(mu, n):
            setattr(mu, n, getattr(pu, n))
    return torch


def install_mplug_package():
    """install_mplug() + the timm stubs `mPLUG/models/vit.py` imports, and
    `/root/reference/mPLUG` on sys.path — enough to `from models import
    model_vqa_mplug` and run its methods unbound (the stubbed timm symbols
    are ViT-construction helpers the oracle paths never call)."""
    torch = install_mplug()

    def _mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        m.__path__ = []
        # a real __spec__ keeps importlib.util.find_spec working for later
        # importers (hg_transformers/lxmert_file_utils.py probes
        # find_spec("timm"); a spec-less stub raises ValueError there)
        m.__spec__ = importlib.util.spec_from_loader(name, loader=None,
                                                     is_package=True)
        sys.modules[name] = m
        return m

    class _DropPath(torch.nn.Module):
        def forward(self, x):
            return x

    _mod("timm")
    _mod("timm.models")
    _mod("timm.models.layers", trunc_normal_=lambda *a, **k: None,
         DropPath=_DropPath)
    _mod("timm.models.vision_transformer", _cfg=lambda **k: {},
         PatchEmbed=type("PatchEmbed", (torch.nn.Module,), {}))
    _mod("timm.models.registry", register_model=lambda f: f)
    add_mplug_path()
    return torch


def add_mplug_path():
    """Put `/root/reference/mPLUG` on sys.path AFTER the root reference dir.

    Both trees carry colliding top-level names: `masking` (namespace-package
    halves with a `maskers.py` in each) and `utils` (a root PACKAGE with
    param_parser/versions vs mPLUG's utils.py MODULE). Root-first keeps
    `utils.param_parser` importable for the root drivers
    (prune_debias_VQA.py:35) — with mPLUG first, `utils` binds to the
    module and `import utils.param_parser` raises ModuleNotFoundError for
    every LATER oracle test loading a root driver. All mPLUG-unique names
    (models/scheduler/optim/dataset/vqaTools) still resolve; mPLUG masker
    modules must go through load_ref_module aliases.
    """
    mplug_dir = f"{REFERENCE}/mPLUG"
    if mplug_dir in sys.path:
        return
    # root `utils` is a NAMESPACE package (no __init__.py) — a regular
    # utils.py anywhere on sys.path beats namespace portions regardless of
    # order, so once mPLUG/utils.py is reachable, a bare `import utils`
    # binds the module and `import utils.param_parser` (the root drivers,
    # prune_debias_VQA.py:35) dies with "'utils' is not a package".
    # Pre-caching the root namespace package + its submodule pins them in
    # sys.modules first. (mPLUG's own code only does bare `import utils`
    # for helpers our oracle paths never call.)
    importlib.import_module("utils.param_parser")
    try:
        idx = sys.path.index(REFERENCE) + 1
    except ValueError:
        idx = 0
    sys.path.insert(idx, mplug_dir)


def load_ref_module(alias: str, relpath: str):
    """Import a reference source file directly (no package __init__ chain —
    `mPLUG/models/clip/__init__.py` pulls torchvision, absent here)."""
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(
        alias, f"{REFERENCE}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        # never cache a half-executed module: the NEXT test's load would
        # silently get the broken partial (AttributeError far from the cause)
        sys.modules.pop(alias, None)
        raise
    return mod


def load_flax_into_torch(torch_model, flax_params, allow_missing=()):
    """Transplant a flax param tree into a reference torch module.

    Uses the same name/orientation mapping that makes mask.pt and classifier
    checkpoints interoperable (torch_compat). Asserts every torch param is
    covered (missing keys allowed only under `allow_missing` substrings) and
    nothing is left over.
    """
    import numpy as np

    torch = install()
    from crvqa_tpu.core.torch_compat import flax_to_torch_state_dict

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
        for k, v in flax_to_torch_state_dict(flax_params).items()
    }
    missing, unexpected = torch_model.load_state_dict(sd, strict=False)
    assert not unexpected, f"unmapped flax params: {sorted(unexpected)[:8]}"
    leftover = [m for m in missing
                if not any(sub in m for sub in allow_missing)]
    assert not leftover, f"torch params not covered: {sorted(leftover)[:8]}"
    return torch_model
