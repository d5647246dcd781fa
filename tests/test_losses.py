"""Golden-tensor tests for the debias loss zoo against the reference torch
implementations (formulas from vqa_debias_loss_functions.py and
mask_trainer_Robust_VQA.py:161-186), cross-checked with torch-cpu."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.losses import (
    bce_with_logits,
    bias_product,
    learned_mixin,
    learned_mixin_init,
    lpf_loss,
    plain_bce,
    reweight_by_inv_bias,
    rubi_loss,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    b, n, h = 4, 7, 16
    logits = rng.randn(b, n).astype(np.float32)
    labels = (rng.rand(b, n) < 0.3).astype(np.float32) * rng.rand(b, n).astype(np.float32)
    bias = rng.rand(b, n).astype(np.float32) * 0.9 + 0.05
    hidden = rng.randn(b, h).astype(np.float32)
    max_label = rng.randint(0, n, size=(b,)).astype(np.int32)
    return logits, labels, bias, hidden, max_label


def test_plain_bce_matches_torch(batch):
    logits, labels, *_ = batch
    ours = float(plain_bce(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(
        F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(labels)
        )
        * labels.shape[1]
    )
    assert abs(ours - theirs) < 2e-4


def test_bce_with_logits_elementwise(batch):
    logits, labels, *_ = batch
    ours = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def _torch_learned_mixin(hidden, logits, bias, labels, kernel, lin_bias,
                         smooth_param, w=0.36):
    """Direct torch port of LearnedMixin.forward (vqa_debias_loss_functions
    .py:148-196) for golden comparison."""
    hidden = torch.tensor(hidden)
    logits = torch.tensor(logits)
    bias = torch.tensor(bias)
    labels = torch.tensor(labels)
    factor = F.softplus(hidden @ torch.tensor(kernel) + torch.tensor(lin_bias))
    bias = torch.stack([bias, 1 - bias], 2)
    bias = bias + torch.sigmoid(torch.tensor(smooth_param)).unsqueeze(1)
    bias = torch.log(bias) * factor.unsqueeze(1)
    log_prob = -F.softplus(-logits)
    log_one_minus = -logits + log_prob
    log_probs = torch.stack([log_prob, log_one_minus], 2)
    fused = bias + log_probs
    a, b = fused[:, :, 0], fused[:, :, 1]
    norm = torch.max(a, b) + torch.log1p(torch.exp(-torch.abs(a - b)))
    log_prob, log_one_minus = a - norm, b - norm
    sum_prob = (log_prob * labels + (1 - labels) * log_one_minus).sum(1)
    sum_prob = torch.where(torch.isnan(sum_prob), torch.zeros_like(sum_prob), sum_prob)
    loss = -sum_prob.mean(0)
    bias_norm = torch.max(bias[:, :, 0], bias[:, :, 1]) + torch.log1p(
        torch.exp(-torch.abs(bias[:, :, 0] - bias[:, :, 1]))
    )
    bias_logprob = bias - bias_norm.unsqueeze(2)
    entropy = -(torch.exp(bias_logprob) * bias_logprob).sum(2).mean()
    return float(loss + w * entropy)


def test_learned_mixin_matches_reference_formula(batch):
    logits, labels, bias, hidden, _ = batch
    params = learned_mixin_init(jax.random.PRNGKey(1), hidden_size=hidden.shape[1])
    ours = float(
        learned_mixin(params, jnp.asarray(hidden), jnp.asarray(logits),
                      jnp.asarray(bias), jnp.asarray(labels))
    )
    theirs = _torch_learned_mixin(
        hidden, logits, bias, labels,
        np.asarray(params["bias_lin"]["kernel"]),
        np.asarray(params["bias_lin"]["bias"]),
        np.asarray(params["smooth_param"]),
    )
    assert abs(ours - theirs) < 2e-4


def test_lpf_matches_reference_formula(batch):
    logits, _, bias, _, max_label = batch
    gamma = 5.0
    ours = float(lpf_loss(jnp.asarray(logits), jnp.asarray(bias),
                          jnp.asarray(max_label), gamma))
    # torch port of LPF_loss (mask_trainer_Robust_VQA.py:161-179)
    tl = torch.tensor(logits)
    tb = torch.tensor(bias)
    ml = torch.tensor(max_label.astype(np.int64)).view(-1, 1)
    vqa_pt = torch.clamp(F.softmax(tl, dim=-1), min=1e-7)
    qo_pt = torch.clamp(tb, min=1e-7)
    vqa_logpt = torch.log(vqa_pt).gather(-1, ml).view(-1)
    qo_logpt = torch.log(qo_pt).gather(-1, ml).view(-1)
    theirs = float((((1 - torch.exp(qo_logpt)) ** gamma) * (-vqa_logpt)).mean())
    assert abs(ours - theirs) < 2e-4


def test_rubi_matches_reference_formula(batch):
    logits, _, bias, _, max_label = batch
    ours = float(rubi_loss(jnp.asarray(logits), jnp.asarray(bias), jnp.asarray(max_label)))
    fused = torch.tensor(logits) * torch.sigmoid(torch.tensor(bias))
    theirs = float(torch.nn.CrossEntropyLoss()(fused, torch.tensor(max_label.astype(np.int64))))
    assert abs(ours - theirs) < 2e-4


def test_reweight_by_inv_bias(batch):
    logits, labels, bias, *_ = batch
    ours = float(reweight_by_inv_bias(jnp.asarray(logits), jnp.asarray(bias),
                                      jnp.asarray(labels)))
    tl, tb, ty = torch.tensor(logits), torch.tensor(bias), torch.tensor(labels)
    log_prob = -F.softplus(-tl)
    log_1m = -tl + log_prob
    loss = -(log_prob * ty + (1 - ty) * log_1m)
    weights = 1 - tb
    theirs = float((loss * weights).sum() / weights.sum())
    assert abs(ours - theirs) < 2e-4


def test_bias_product(batch):
    logits, labels, bias, *_ = batch
    smooth = jnp.full((1,), -1.0)
    ours = float(bias_product(jnp.asarray(logits), jnp.asarray(bias),
                              jnp.asarray(labels), smooth_param=smooth))
    tl, tb, ty = torch.tensor(logits), torch.tensor(bias), torch.tensor(labels)
    s = torch.sigmoid(torch.tensor(-1.0))
    bias_lp = torch.log(tb + s)
    bias_inv = torch.log1p(-tb + s)
    log_prob = -F.softplus(-tl) + bias_lp
    log_1m = -tl + (-F.softplus(-tl)) + bias_inv
    norm = torch.max(log_prob, log_1m) + torch.log1p(torch.exp(-torch.abs(log_prob - log_1m)))
    log_prob, log_1m = log_prob - norm, log_1m - norm
    theirs = float(-(log_prob * ty + (1 - ty) * log_1m).sum(1).mean(0))
    assert abs(ours - theirs) < 2e-4


def test_losses_are_jittable_and_differentiable(batch):
    logits, labels, bias, hidden, max_label = batch
    params = learned_mixin_init(jax.random.PRNGKey(0), hidden.shape[1])

    @jax.jit
    def f(p, lg):
        return learned_mixin(p, jnp.asarray(hidden), lg, jnp.asarray(bias),
                             jnp.asarray(labels))

    g = jax.grad(f, argnums=1)(params, jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
