"""Reference-oracle parity: structured (head / whole-matrix) masking.

Runs the ACTUAL reference structured-masking code under torch and asserts
our `StructuredMasker` / head-FFN binarizers match:

- `MaskedLinear1(structured_masking='heads')` forward — the [H] score
  template expanded over head rows via `structured_mask_expanding` /
  `reshape_mask_for_sp` (`masking/maskers_Robust.py:139-178, 305-320`);
- the 'layers' scalar-gate variant (template shape [1], no expansion);
- `Binarizer_head` (globally lowest `num_to_mask` heads zeroed, identity
  grads) and `Binarizer_ffn` (threshold STE) from the stage-3 structured
  path (`prune_debias_VQA.py:633-667`).
"""
import numpy as np

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.masking.spec import MaskSpec
from crvqa_tpu.masking.structured import (StructuredMasker, binarize_ffn_ste,
                                          binarize_head_ste)

torch = ref_oracle.install()

THR = 1e-2


class _Cfg:
    num_attention_heads = 4
    hidden_size = 16


def _ref_masked_linear(maskers, w, structured_masking, name):
    return maskers.MaskedLinear1(
        weight=torch.nn.Parameter(torch.from_numpy(
            np.ascontiguousarray(w.T))),
        bias=torch.nn.Parameter(torch.zeros(w.shape[1])),
        mask_biases=False,
        name=name,
        padding_idx=None,
        threshold=torch.tensor(THR),
        init_sparsity=0.5,
        init_scale=2e-2,
        controlled_init=None,
        structured_masking_info={
            "ptl_config": _Cfg(), "structured_masking": structured_masking,
            "structured_masking_types": ["self"], "force_masking": "bert",
        },
    )


def test_structured_heads_forward_oracle():
    from masking import maskers_Robust

    rng = np.random.default_rng(0)
    w = rng.normal(size=(_Cfg.hidden_size, _Cfg.hidden_size)).astype(np.float32)
    x = rng.normal(size=(3, _Cfg.hidden_size)).astype(np.float32)
    # two heads above threshold, one exactly AT it (strict > drops it), one below
    head_scores = np.array([0.03, THR, -0.02, 0.5], np.float32)

    ml = _ref_masked_linear(maskers_Robust, w, "heads",
                            "encoder.layer.0.attention.self.query")
    assert ml.structured_masked and ml.weight_mask.shape == (4,)
    ml.weight_mask.data = torch.from_numpy(head_scores.copy())
    with torch.no_grad():
        ref_y = ml(torch.from_numpy(x)).numpy()

    spec = MaskSpec(path=("att", "self", "query", "kernel"),
                    torch_name="att.self.query", weight_type="lQ",
                    modality="Uni")
    masker = StructuredMasker.create(
        [spec], {"Uni": 0.5}, controlled_init=None,
        structured_masking="heads", structured_types=("self",),
        num_heads=_Cfg.num_attention_heads)
    params = {"att": {"self": {"query": {"kernel": jnp.asarray(w)}}}}
    scores = {spec.key: jnp.asarray(head_scores)}
    thresholds = {spec.key: jnp.asarray(THR, jnp.float32)}
    masked = masker.apply_masks(params, scores, thresholds)
    ours_y = np.asarray(jnp.asarray(x) @ masked["att"]["self"]["query"]["kernel"])

    np.testing.assert_allclose(ours_y, ref_y, rtol=1e-6, atol=1e-6)
    # the masked kernel really zeroes whole head column-blocks (heads 1, 2)
    k = np.asarray(masked["att"]["self"]["query"]["kernel"])
    hs = _Cfg.hidden_size // _Cfg.num_attention_heads
    assert (k[:, hs:3 * hs] == 0).all() and (k[:, :hs] != 0).any()


def test_structured_layers_forward_oracle():
    from masking import maskers_Robust

    rng = np.random.default_rng(1)
    w = rng.normal(size=(10, 12)).astype(np.float32)
    x = rng.normal(size=(2, 10)).astype(np.float32)

    spec = MaskSpec(path=("att", "self", "query", "kernel"),
                    torch_name="att.self.query", weight_type="lQ",
                    modality="Uni")
    masker = StructuredMasker.create(
        [spec], {"Uni": 0.5}, controlled_init=None,
        structured_masking="layers", structured_types=("self",))
    params = {"att": {"self": {"query": {"kernel": jnp.asarray(w)}}}}

    for gate in (0.05, -0.01):  # kept / dropped
        ml = _ref_masked_linear(maskers_Robust, w, "layers",
                                "encoder.layer.0.attention.self.query")
        assert ml.weight_mask.shape == (1,)
        ml.weight_mask.data = torch.tensor([gate])
        with torch.no_grad():
            ref_y = ml(torch.from_numpy(x)).numpy()

        scores = {spec.key: jnp.asarray(gate, jnp.float32)}
        thresholds = {spec.key: jnp.asarray(THR, jnp.float32)}
        masked = masker.apply_masks(params, scores, thresholds)
        ours_y = np.asarray(
            jnp.asarray(x) @ masked["att"]["self"]["query"]["kernel"])
        np.testing.assert_allclose(ours_y, ref_y, rtol=1e-6, atol=1e-6)


def test_binarizer_head_oracle():
    """`Binarizer_head` masks EXACTLY the globally lowest num_to_mask heads
    with identity grads (prune_debias_VQA.py:633-653)."""
    ref = ref_oracle.load_ref_module("ref_stage2_driver", "prune_debias_VQA.py")

    rng = np.random.default_rng(2)
    L, H = 3, 4
    scores = rng.normal(size=(L, H)).astype(np.float32)
    for k in (0, 1, 5, L * H):
        t = torch.from_numpy(scores.copy()).requires_grad_(True)
        # NOTE the reference decodes flat indices with `// num_heads` —
        # pass num_heads=H exactly as prune_debias_VQA.py:787 does
        ref_mask = ref.Binarizer_head.apply(t, k, H)
        g = torch.from_numpy(rng.normal(size=(L, H)).astype(np.float32))
        ref_mask.backward(g)

        ours = binarize_head_ste(jnp.asarray(scores), k)
        np.testing.assert_array_equal(np.asarray(ours),
                                      ref_mask.detach().numpy(), err_msg=f"k={k}")
        assert int((np.asarray(ours) == 0).sum()) == k
        # identity STE grads on both sides
        ours_g = jax.grad(
            lambda s: jnp.sum(binarize_head_ste(s, k) * jnp.asarray(g.numpy()))
        )(jnp.asarray(scores))
        np.testing.assert_allclose(np.asarray(ours_g), t.grad.numpy(),
                                   rtol=1e-7)


def test_binarizer_ffn_oracle():
    ref = ref_oracle.load_ref_module("ref_stage2_driver", "prune_debias_VQA.py")

    scores = np.array([[-0.3, 0.0, THR, 2 * THR], [0.5, -THR, 0.011, 0.009]],
                      np.float32)
    t = torch.from_numpy(scores.copy()).requires_grad_(True)
    ref_mask = ref.Binarizer_ffn.apply(t, torch.tensor(THR))
    ref_mask.backward(torch.ones_like(ref_mask))

    ours = binarize_ffn_ste(jnp.asarray(scores), jnp.asarray(THR, jnp.float32))
    np.testing.assert_array_equal(np.asarray(ours), ref_mask.detach().numpy())
    ours_g = jax.grad(lambda s: jnp.sum(
        binarize_ffn_ste(s, jnp.asarray(THR, jnp.float32))))(jnp.asarray(scores))
    np.testing.assert_allclose(np.asarray(ours_g), t.grad.numpy(), rtol=1e-7)
