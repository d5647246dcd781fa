"""Reference-oracle parity: binarizer schemes 2/3, sparsity schedulers, and
the mPLUG magnitude_soft masker init — run against the ACTUAL reference
autograd functions and scheduler classes
(`masking/maskers_Robust.py:382-486`, `masking/sparsity_control_Robust.py`,
`mPLUG/masking/maskers.py:199-280`)."""
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.masking.binarizers import binarize_sign, make_binarize_bernoulli

torch = ref_oracle.install()


def test_binarizer2_fwd_and_grad_oracle():
    """binarize_sign vs the reference `_Binarizer2` autograd: forward
    (sign+1)/2 and the |s|>=1 gradient gate (maskers_Robust.py:386-404),
    including boundary values exactly at +-1."""
    from masking.maskers_Robust import _Binarizer2

    s = np.array([-2.0, -1.0, -0.5, 0.0, 0.3, 1.0, 1.7], np.float32)
    c = np.array([1.0, 2.0, -1.0, 3.0, 0.5, -2.0, 1.5], np.float32)

    st = torch.tensor(s, requires_grad=True)
    out_t = _Binarizer2.apply(st)
    (out_t * torch.from_numpy(c)).sum().backward()

    out_j = binarize_sign(jnp.asarray(s), jnp.asarray(0.0))
    grad_j = jax.grad(
        lambda x: jnp.sum(binarize_sign(x, jnp.asarray(0.0)) * c))(
            jnp.asarray(s))
    np.testing.assert_array_equal(np.asarray(out_j), out_t.detach().numpy())
    np.testing.assert_array_equal(np.asarray(grad_j), st.grad.numpy())


def test_binarizer3_grad_and_distribution_oracle():
    """scheme 3: identity STE grad exactly like `_Binarizer3`
    (maskers_Robust.py:443-450), and bernoulli(sigmoid(s)) sampling whose
    empirical keep rate matches the reference sampler's."""
    from masking.maskers_Robust import _Binarizer3

    s = np.linspace(-3, 3, 4096).astype(np.float32)
    c = np.random.default_rng(0).normal(size=s.shape).astype(np.float32)
    st = torch.tensor(s, requires_grad=True)
    torch.manual_seed(0)
    out_t = _Binarizer3.apply(st)
    (out_t * torch.from_numpy(c)).sum().backward()
    np.testing.assert_array_equal(st.grad.numpy(), c)  # identity STE

    binar = make_binarize_bernoulli(jax.random.PRNGKey(1))
    grad_j = jax.grad(lambda x: jnp.sum(binar(x, jnp.asarray(0.0)) * c))(
        jnp.asarray(s))
    np.testing.assert_array_equal(np.asarray(grad_j), c)
    # same Bernoulli(sigmoid) law: empirical means agree to sampling noise
    out_j = np.asarray(binar(jnp.asarray(s), jnp.asarray(0.0)))
    assert abs(out_j.mean() - out_t.detach().numpy().mean()) < 0.03


def _ref_scheduler(**conf_over):
    import masking.sparsity_control_Robust as ref_sc

    class Conf:
        pass

    conf = Conf()
    conf.num_epochs = 20
    conf.logger = logging.getLogger("oracle")
    conf.masking_scheduler_conf_ = {
        "final_sparsity": 0.7,
        "sparsity_warmup_interval_epoch": 1,
        "init_sparsity": 0.1,
        "lambdas_lr": 1,
        **conf_over,
    }
    return ref_sc.MaskerScheduler(conf)


def test_agp_schedule_oracle():
    """automated_gradual_sparsity targets vs the reference scheduler's
    `get_sparsity_fn` over a dense epoch grid (sparsity_control_Robust.py:
    10-39, 88-140), plus the is_skip gate semantics."""
    from crvqa_tpu.masking.sparsity_control import MaskerScheduler

    ref = _ref_scheduler()
    ours = MaskerScheduler(final_sparsity=0.7, init_sparsity=0.1,
                           num_epochs=20, lambdas_lr=1,
                           sparsity_warmup_interval_epoch=1)
    assert not ref.is_skip and not ours.is_skip
    for epoch in np.linspace(0, 25, 101):
        want = ref.get_sparsity_fn(float(epoch), 0.0)
        got = ours.get_sparsity_fn(float(epoch), 0.0)
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(epoch))
    # lambdas_lr=0 (the shipped default) => skip on both sides
    assert _ref_scheduler(lambdas_lr=0).is_skip
    assert MaskerScheduler(final_sparsity=0.7, lambdas_lr=0).is_skip


def test_stepwise_schedule_oracle():
    """stepwise_sparsity vs the reference under the reference's own polling
    pattern (exactly on interval boundaries — its float-modulo trigger,
    sparsity_control_Robust.py:42-85); our pure-function redesign must
    reproduce the threaded trajectory."""
    import masking.sparsity_control_Robust as ref_sc

    from crvqa_tpu.masking.sparsity_control import stepwise_sparsity

    kw = dict(init_sparsity=0.3, final_sparsity=0.7, interval_epoch=1,
              init_epoch=2, final_epoch=16, sparsity_incremental_ratio=0.12)
    ref_f = ref_sc.stepwise_sparsity(**kw)
    our_f = stepwise_sparsity(**kw)
    cur_ref = cur_ours = kw["init_sparsity"]
    for epoch in range(0, 20):
        got_ref = ref_f(float(epoch), cur_ref)
        got_ours = our_f(float(epoch), cur_ours)
        np.testing.assert_allclose(got_ours, got_ref, rtol=1e-12,
                                   err_msg=str(epoch))
        cur_ref, cur_ours = got_ref, got_ours


def test_mplug_magnitude_soft_oracle():
    """Masker.init('magnitude_soft') vs the mPLUG reference masker's
    `_magnitude_soft` (scores := |w|, threshold := kth(|w|),
    mPLUG/masking/maskers.py:218-224)."""
    ref_oracle.install_mplug()
    mplug_maskers = ref_oracle.load_ref_module("ref_mplug_maskers",
                                               "mPLUG/masking/maskers.py")

    from crvqa_tpu.masking import Masker
    from crvqa_tpu.masking.spec import MaskSpec

    rng = np.random.default_rng(3)
    w = rng.normal(size=(12, 20)).astype(np.float32)
    sp = 0.45

    ml = mplug_maskers.MaskedLinear1(
        weight=torch.nn.Parameter(torch.from_numpy(
            np.ascontiguousarray(w.T))),
        bias=torch.nn.Parameter(torch.zeros(w.shape[1])),
        mask_biases=False,
        global_prune=False,
        name="fusion_encoder.encoder.layer.6.attention.self.query",
        padding_idx=None,
        threshold=torch.tensor(1e-2),
        init_sparsity=sp,
        init_scale=2e-2,
        controlled_init="magnitude_soft",
        global_threshold=None,
        structured_masking_info={
            "ptl_config": None, "structured_masking": None,
            "structured_masking_types": None, "force_masking": "bert",
        },
    )

    spec = MaskSpec(path=("lin", "kernel"), torch_name="lin",
                    weight_type="K", modality="Uni")
    masker = Masker.create([spec], {"Uni": sp},
                           controlled_init="magnitude_soft")
    scores, thresholds = masker.init({"lin": {"kernel": jnp.asarray(w)}})

    np.testing.assert_allclose(np.asarray(scores[spec.key]).T,
                               ml.weight_mask.detach().numpy(), rtol=1e-7)
    np.testing.assert_allclose(float(thresholds[spec.key]),
                               float(ml.threshold), rtol=1e-7)
    # binarized masks agree too (strict > threshold on both sides)
    from masking.maskers_Robust import binarizer_fn1

    ref_mask = binarizer_fn1(ml.weight_mask.data,
                             ml.threshold).numpy().astype(bool)
    ours = np.asarray(masker.binary_masks(scores, thresholds)[spec.key])
    np.testing.assert_array_equal(ours.T, ref_mask)


def test_mask_biases_forward_oracle():
    """`mask_biases=True` vs the reference MaskedLinear1: the bias mask
    gets the SAME controlled magnitude init as the weight's (on |b|) and
    binarizes with the MODULE's weight threshold
    (maskers_Robust.py:193-199, 360-367)."""
    from masking.maskers_Robust import MaskedLinear1

    from crvqa_tpu.masking import Masker
    from crvqa_tpu.masking.masker import bias_key
    from crvqa_tpu.masking.spec import MaskSpec

    rng = np.random.default_rng(5)
    w = rng.normal(size=(10, 12)).astype(np.float32)
    b = rng.normal(size=(12,)).astype(np.float32)
    x = rng.normal(size=(3, 10)).astype(np.float32)
    sp = 0.4

    ml = MaskedLinear1(
        weight=torch.nn.Parameter(torch.from_numpy(
            np.ascontiguousarray(w.T))),
        bias=torch.nn.Parameter(torch.from_numpy(b.copy())),
        mask_biases=True,
        name="encoder.layer.0.attention.output.dense",
        padding_idx=None,
        threshold=torch.tensor(1e-2),
        init_sparsity=sp,
        init_scale=2e-2,
        controlled_init="magnitude",
        structured_masking_info={
            "ptl_config": None, "structured_masking": None,
            "structured_masking_types": None, "force_masking": "bert",
        },
    )
    with torch.no_grad():
        ref_y = ml(torch.from_numpy(x)).numpy()

    spec = MaskSpec(path=("lin", "kernel"), torch_name="lin",
                    weight_type="AO", modality="Uni")
    masker = Masker.create([spec], {"Uni": sp}, controlled_init="magnitude",
                           mask_biases=True)
    params = {"lin": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    scores, thresholds = masker.init(params)
    bk = bias_key(spec)
    assert bk in scores

    # bias-mask init parity (deterministic for 'magnitude')
    np.testing.assert_allclose(np.asarray(scores[bk]),
                               ml.bias_mask.detach().numpy(), rtol=1e-7)

    masked = masker.apply_masks(params, scores, thresholds)
    ours_y = np.asarray(jnp.asarray(x) @ masked["lin"]["kernel"]
                        + masked["lin"]["bias"])
    np.testing.assert_allclose(ours_y, ref_y, rtol=1e-6, atol=1e-6)
    # the masked bias really has zeros at ~the target rate
    zb = float((np.asarray(masked["lin"]["bias"]) == 0).mean())
    assert abs(zb - sp) < 0.2
