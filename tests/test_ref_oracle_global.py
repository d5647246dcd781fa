"""Reference-oracle parity: global (whole-model) magnitude pruning.

Runs the ACTUAL reference global masker (`masking/global_maskers.py`:
`compute_global_threshold` :531-543, `MaskedLinearX.controlled_init`
`_magnitude_global` :219-230) and the global trainer's threshold reset
(`hg_transformers/global_mask_trainer_VQA.py:421-445`) under torch, and
asserts our `controlled_init='magnitude_global'` init and
`global_prune=True` reset produce identical thresholds / scores / masks.
"""
import logging
import types

import numpy as np

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.masking import Masker
from crvqa_tpu.masking.spec import MaskSpec

torch = ref_oracle.install()

THR = 1e-2


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    # deliberately different sizes AND different scales so the global
    # threshold lands very unevenly across modules (the point of global
    # pruning vs per-matrix)
    return {
        "a": rng.normal(size=(8, 12)).astype(np.float32) * 0.3,
        "b": rng.normal(size=(16, 10)).astype(np.float32),
        "c": rng.normal(size=(6, 6)).astype(np.float32) * 3.0,
    }


def _specs():
    return [MaskSpec(path=(n, "kernel"), torch_name=n, weight_type="K",
                     modality="Uni") for n in ("a", "b", "c")]


def _ref_global_threshold(gm, ws, sparsity):
    """Execute the reference's compute_global_threshold on a real torch
    module tree (weights transposed to torch orientation)."""
    model = torch.nn.Module()
    for n, w in ws.items():
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        lin.weight = torch.nn.Parameter(
            torch.from_numpy(np.ascontiguousarray(w.T)))
        model.add_module(n, lin)
    ns = types.SimpleNamespace(
        logger=logging.getLogger("oracle"),
        masker_scheduler=types.SimpleNamespace(init_sparsity=sparsity))
    gm.Masker.compute_global_threshold(ns, model, set(ws))
    return ns.global_threshold


def test_global_magnitude_init_oracle():
    gm = ref_oracle.load_ref_module("ref_global_maskers",
                                    "masking/global_maskers.py")
    ws = _weights()
    sp = 0.7
    gthr = _ref_global_threshold(gm, ws, sp)

    masker = Masker.create(_specs(), {"Uni": sp},
                           controlled_init="magnitude_global")
    params = {n: {"kernel": jnp.asarray(w)} for n, w in ws.items()}
    scores, thresholds = masker.init(params)

    for n, w in ws.items():
        ml = gm.MaskedLinear1(
            weight=torch.nn.Parameter(
                torch.from_numpy(np.ascontiguousarray(w.T))),
            bias=torch.nn.Parameter(torch.zeros(w.shape[1])),
            mask_biases=False,
            global_prune=True,
            name=n,
            padding_idx=None,
            threshold=torch.tensor(THR),
            init_sparsity=sp,
            init_scale=2e-2,
            controlled_init="magnitude",
            global_threshold=gthr,
            structured_masking_info={
                "ptl_config": None, "structured_masking": None,
                "structured_masking_types": None, "force_masking": "bert",
            },
        )
        key = f"{n}/kernel"
        np.testing.assert_allclose(np.asarray(scores[key]).T,
                                   ml.weight_mask.detach().numpy(),
                                   rtol=1e-7, err_msg=n)
        assert float(thresholds[key]) == np.float32(THR)

    # the uneven-scale module 'a' must be pruned far above the nominal rate,
    # 'c' far below — i.e. the global threshold really is global
    za = float((np.asarray(scores["a/kernel"]) == 0).mean())
    zc = float((np.asarray(scores["c/kernel"]) == 0).mean())
    assert za > 0.9 and zc < 0.2, (za, zc)


def test_global_reset_threshold_oracle():
    """The global trainer's reset: ONE kth-value over the concatenation of
    every module's mask scores (global_mask_trainer_VQA.py:424-439)."""
    rng = np.random.default_rng(1)
    scores_np = {
        "a/kernel": rng.normal(size=(8, 12)).astype(np.float32),
        "b/kernel": rng.normal(size=(16, 10)).astype(np.float32),
        "c/kernel": rng.normal(size=(6, 6)).astype(np.float32),
    }
    sp = 0.6
    # reference arithmetic, executed in torch
    concat = torch.cat([torch.from_numpy(v).view(-1)
                        for v in scores_np.values()])
    ref_thr = float(concat.kthvalue(int(concat.nelement() * sp)).values)

    masker = Masker.create(_specs(), {"Uni": sp},
                           controlled_init="magnitude_global",
                           global_prune=True)
    thresholds = masker.reset_thresholds(
        {k: jnp.asarray(v) for k, v in scores_np.items()})
    for k, t in thresholds.items():
        assert abs(float(t) - ref_thr) < 1e-7, k

    # binarized global sparsity lands on target (strict > on both sides)
    masks = masker.binary_masks(
        {k: jnp.asarray(v) for k, v in scores_np.items()}, thresholds)
    total = sum(int((~np.asarray(m)).sum()) for m in masks.values())
    n = sum(v.size for v in scores_np.values())
    assert total == int(n * sp)
