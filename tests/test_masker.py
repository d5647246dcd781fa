"""Masker unit tests: controlled init sparsity, threshold reset kth-value
semantics (incl. ties), per-modality targets, apply/prune round trips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.masking import Masker, MaskSpec, magnitude_masks
from crvqa_tpu.ops import kth_smallest, sparsity_threshold


def _toy_setup(controlled_init="magnitude", zerorate=None, **kw):
    params = {
        "m": {
            "a": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (40, 50))},
            "b": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (30, 20))},
        }
    }
    specs = [
        MaskSpec(path=("m", "a", "kernel"), torch_name="m.a", weight_type="lK",
                 modality="Lang"),
        MaskSpec(path=("m", "b", "kernel"), torch_name="m.b", weight_type="vK",
                 modality="Vis"),
    ]
    zr = zerorate or {"Lang": 0.7, "Vis": 0.5}
    masker = Masker.create(specs, zr, controlled_init=controlled_init, **kw)
    return params, masker


def test_kth_smallest_matches_sorted():
    x = jnp.asarray(np.random.RandomState(0).randn(997))
    for k in (1, 10, 500, 997):
        assert float(kth_smallest(x, k)) == float(np.sort(np.asarray(x))[k - 1])


def test_kth_smallest_with_ties():
    x = jnp.array([1.0, 0.0, 0.0, 0.0, 2.0, 3.0])
    assert float(kth_smallest(x, 3)) == 0.0
    # strict > threshold zeroes all ties, like binarizer_fn1
    assert int(jnp.sum(x > kth_smallest(x, 3))) == 3


def test_magnitude_init_hits_target_sparsity():
    params, masker = _toy_setup("magnitude")
    scores, thresholds = masker.init(params)
    for key, target in (("m/a/kernel", 0.7), ("m/b/kernel", 0.5)):
        s = scores[key]
        zero_rate = float(jnp.mean(s <= thresholds[key]))
        n = s.size
        expected = int(n * target) / n
        assert abs(zero_rate - expected) < 1e-6
        # scores are exactly {0, 2*threshold}
        uniq = np.unique(np.asarray(s))
        assert len(uniq) == 2
        np.testing.assert_allclose(uniq, [0.0, 0.02], atol=1e-7)


def test_uniform_init_hits_target_sparsity():
    params, masker = _toy_setup("uniform")
    scores, thresholds = masker.init(params, jax.random.PRNGKey(42))
    s = scores["m/a/kernel"]
    zero_rate = float(jnp.mean(s == 0.0))
    assert abs(zero_rate - int(s.size * 0.7) / s.size) < 1e-6


def test_double_uniform_init_value_bands():
    params, masker = _toy_setup("double_uniform")
    scores, _ = masker.init(params, jax.random.PRNGKey(42))
    s = np.asarray(scores["m/b/kernel"]).ravel()
    thr = 0.01
    below = s[(s >= 0.5 * thr) & (s <= 0.9 * thr)]
    above = s[(s >= 1.1 * thr) & (s <= 1.5 * thr)]
    assert len(below) + len(above) == s.size
    assert len(below) > 0 and len(above) > 0


def test_magnitude_soft_init():
    params, masker = _toy_setup("magnitude_soft")
    scores, thresholds = masker.init(params)
    w = params["m"]["a"]["kernel"]
    np.testing.assert_allclose(np.asarray(scores["m/a/kernel"]),
                               np.abs(np.asarray(w)), rtol=1e-6)
    zero_rate = float(jnp.mean(scores["m/a/kernel"] <= thresholds["m/a/kernel"]))
    assert abs(zero_rate - int(w.size * 0.7) / w.size) < 1e-6


def test_random_init_expected_sparsity():
    params, masker = _toy_setup(None, zerorate={"Lang": 0.6, "Vis": 0.6})
    scores, thresholds = masker.init(params, jax.random.PRNGKey(7))
    s = scores["m/a/kernel"]
    # uniform(-init_scale, (init_scale+thr)/sp - init_scale) ->
    # P(s <= thr) = (thr+init_scale)/(hi+init_scale) = sp
    zero_rate = float(jnp.mean(s <= thresholds["m/a/kernel"]))
    assert abs(zero_rate - 0.6) < 0.05


def test_reset_thresholds_enforces_modal_targets():
    params, masker = _toy_setup("magnitude")
    scores, _ = masker.init(params, jax.random.PRNGKey(0))
    # perturb scores away from the clean two-value init
    scores = {k: v + 0.001 * jax.random.normal(jax.random.PRNGKey(3), v.shape)
              for k, v in scores.items()}
    thresholds = jax.jit(masker.reset_thresholds)(scores)
    for key, target in (("m/a/kernel", 0.7), ("m/b/kernel", 0.5)):
        n = scores[key].size
        zero_rate = float(jnp.mean(scores[key] <= thresholds[key]))
        assert abs(zero_rate - int(n * target) / n) < 1e-6


def test_global_prune_single_threshold():
    params, masker = _toy_setup("magnitude", zerorate={"Lang": 0.7, "Vis": 0.7},
                                global_prune=True)
    scores, _ = masker.init(params, jax.random.PRNGKey(0))
    scores = {k: jax.random.normal(jax.random.PRNGKey(i), v.shape)
              for i, (k, v) in enumerate(scores.items())}
    thresholds = masker.reset_thresholds(scores)
    ts = {float(t) for t in thresholds.values()}
    assert len(ts) == 1
    total = sum(int(jnp.sum(scores[k] <= t)) for k, t in thresholds.items())
    n = sum(v.size for v in scores.values())
    assert abs(total / n - 0.7) < 1e-3


def test_apply_masks_zeroes_weights_and_grads_flow_to_scores():
    params, masker = _toy_setup("magnitude")
    scores, thresholds = masker.init(params)
    masked = masker.apply_masks(params, scores, thresholds)
    w = np.asarray(params["m"]["a"]["kernel"])
    mw = np.asarray(masked["m"]["a"]["kernel"])
    kept = np.asarray(scores["m/a/kernel"]) > 0.01
    np.testing.assert_allclose(mw, w * kept)

    def loss(s):
        m = masker.apply_masks(params, s, thresholds)
        return jnp.sum(m["m"]["a"]["kernel"] ** 2)

    g = jax.grad(loss)(scores)
    # STE: d/ds sum((w*B(s))^2) = 2*(w*B) * w  (nonzero also where mask=0)
    expected = 2 * (w * kept) * w
    np.testing.assert_allclose(np.asarray(g["m/a/kernel"]), expected, rtol=1e-5)


def test_sparsity_report_and_prune():
    params, masker = _toy_setup("magnitude")
    scores, thresholds = masker.init(params)
    report = jax.jit(masker.sparsity_report)(scores, thresholds)
    assert abs(float(report["Lang"]) - 0.7) < 1e-3
    assert abs(float(report["Vis"]) - 0.5) < 1e-3
    assert 0.5 < float(report["all"]) < 0.7

    masks = masker.binary_masks(scores, thresholds)
    pruned = masker.prune_params(params, masks)
    assert float(jnp.mean(pruned["m"]["a"]["kernel"] == 0)) >= 0.7


def test_magnitude_masks_baseline():
    params, masker = _toy_setup()
    masks = magnitude_masks(params, list(masker.specs), masker.zerorate_dict)
    n = masks["m/a/kernel"].size
    assert abs(float(jnp.mean(~masks["m/a/kernel"])) - int(n * 0.7) / n) < 1e-6
