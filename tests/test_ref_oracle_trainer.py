"""Reference-oracle parity: two full stage-2 train steps vs the reference.

Rebuilds the reference training stack end-to-end on the tiny model — the
REAL `MaskedLinear1` patch (`masking/maskers_Robust.py:355-379`), the real
`LearnedMixin` module (`vqa_debias_loss_functions.py:125-196`), gradient
clipping + the custom `optimization.py` AdamW + the linear LR schedule
exactly as wired in `prune_debias_VQA.py:612-630` /
`mask_trainer_Robust_VQA.py:656-674,801-886` — and asserts our jitted
`stage2.make_train_step` produces the same loss trajectory and the same
post-step score / classifier tensors. All dropout is zeroed on both sides
(torch RNG and JAX RNG can't be aligned); everything else is live.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.train import stage2

torch = ref_oracle.install()

LR = 1e-3
TOTAL_STEPS = 10
THRESHOLD = 1e-2


@pytest.fixture(scope="module")
def setup():
    config = LxmertConfig.tiny(hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0,
                               classifier_dropout=0.0)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    return config, model, params, specs, jb


def _build_torch_trainer(config, params, specs, rates, lmh_params,
                         warmup=0, weight_decay=0.0):
    """The reference stage-2 stack on the tiny model."""
    from masking.maskers_Robust import MaskedLinear1
    from optimization import AdamW
    from hg_transformers.optimization import get_linear_schedule_with_warmup
    from hg_transformers.vqa_debias_loss_functions import LearnedMixin
    from hg_transformers.configuration_lxmert import LxmertConfig as TorchCfg
    from hg_transformers.modeling_lxmert import LxmertForMultipleChoice

    tcfg = TorchCfg(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        num_attention_heads=config.num_attention_heads,
        l_layers=config.l_layers, r_layers=config.r_layers,
        x_layers=config.x_layers, intermediate_size=config.intermediate_size,
        visual_feat_dim=config.visual_feat_dim,
        visual_pos_dim=config.visual_pos_dim,
        max_position_embeddings=config.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tcfg.ans_num = config.ans_num
    tm = LxmertForMultipleChoice(tcfg)
    ref_oracle.load_flax_into_torch(tm, params)
    # zero the classifier's hardcoded 0.5 dropout too (classifier.py:13-22)
    for mod in tm.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0

    # the Masker.replace() module surgery (maskers_Robust.py:577-642)
    for spec in specs:
        parent_name, attr = spec.torch_name.rsplit(".", 1)
        parent = tm.get_submodule(parent_name)
        lin = getattr(parent, attr)
        ml = MaskedLinear1(
            name=spec.torch_name,
            weight=lin.weight,
            bias=getattr(lin, "bias", None),
            padding_idx=getattr(lin, "padding_idx", None),
            mask_biases=False,
            threshold=torch.tensor(THRESHOLD),
            init_sparsity=rates[spec.modality],
            init_scale=2e-2,
            controlled_init="magnitude",
            structured_masking_info={
                "ptl_config": tcfg,
                "structured_masking": None,
                "structured_masking_types": None,
                "force_masking": "bert",
            },
        )
        setattr(parent, attr, ml)
    for name, p in tm.named_parameters():
        p.requires_grad = ("mask" in name) or name.startswith("classifier")

    # init_optimizer (prune_debias_VQA.py:612-630): one group per param
    groups = [
        {"params": [v], "name": k, "weight_decay": weight_decay,
         "param_size": v.size(), "nelement": v.nelement(), "lr": LR}
        for k, v in tm.named_parameters() if v.requires_grad
    ]
    opt = AdamW(groups, lr=LR, eps=1e-8)
    sched = get_linear_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=TOTAL_STEPS)

    lmh = LearnedMixin(0.36)
    lmh.bias_lin = torch.nn.Linear(config.hidden_size, 1)
    with torch.no_grad():
        lmh.bias_lin.weight.copy_(torch.from_numpy(
            np.asarray(lmh_params["bias_lin"]["kernel"]).T))
        lmh.bias_lin.bias.copy_(torch.from_numpy(
            np.asarray(lmh_params["bias_lin"]["bias"])))
        lmh.smooth_param.copy_(torch.from_numpy(
            np.asarray(lmh_params["smooth_param"])))
    return tm, opt, sched, lmh


def _torch_two_steps(tm, opt, sched, lmh, jb, loss_type):
    """`_training_step` + the step/clip/schedule block
    (mask_trainer_Robust_VQA.py:656-674)."""
    ids = torch.from_numpy(np.asarray(jb["input_ids"])).long()
    feats = torch.from_numpy(np.asarray(jb["visual_feats"], np.float32))
    pos = torch.from_numpy(np.asarray(jb["visual_pos"], np.float32))
    labels = torch.from_numpy(np.asarray(jb["labels"], np.float32))
    bias = torch.from_numpy(np.asarray(jb["bias"], np.float32))
    losses = []
    for _ in range(2):
        tm.train()
        loss_bce, logits, pooled = tm(
            input_ids=ids, visual_feats=feats, visual_pos=pos,
            token_type_ids=torch.zeros_like(ids), labels=labels)
        if loss_type == "normal":
            loss = loss_bce
        else:
            loss = lmh(pooled, logits, bias, labels, "cpu")
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt.step()
        sched.step()
        opt.zero_grad()
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("loss_type", ["normal", "lmh"])
def test_stage2_two_step_trajectory_oracle(setup, loss_type):
    config, model, params, specs, jb = setup
    sparsity = ModalSparsity.from_compression(.3, .3, .3, .7)
    masker = Masker.create(specs, sparsity, controlled_init="magnitude",
                           threshold=THRESHOLD)
    cfg = stage2.Stage2Config(masker_type=loss_type, learning_rate=LR,
                              total_steps=TOTAL_STEPS, warmup_steps=0,
                              hidden_size=config.hidden_size)
    st, tx = stage2.init_state(model, masker, params, cfg,
                               jax.random.PRNGKey(1))
    lmh_params = st.train_params.get("lmh") or {
        "bias_lin": {"kernel": np.zeros((config.hidden_size, 1), np.float32),
                     "bias": np.zeros((1,), np.float32)},
        "smooth_param": np.full((1,), -1.0, np.float32)}
    # the train step donates its input state; snapshot before stepping
    lmh_params = jax.tree.map(lambda x: np.array(x), lmh_params)

    tm, opt, sched, lmh = _build_torch_trainer(
        config, params, specs, masker.zerorate_dict, lmh_params)
    ref_losses = _torch_two_steps(tm, opt, sched, lmh, jb, loss_type)

    step = stage2.make_train_step(model, masker, tx, cfg)
    st, m1 = step(st, jb)
    st, m2 = step(st, jb)
    ours = [float(m1.loss), float(m2.loss)]
    np.testing.assert_allclose(ours, ref_losses, rtol=3e-5)

    # post-trajectory state parity: a masked score tensor + the classifier
    ref_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    probe = specs[3]  # an attention kernel spec
    ref_scores = ref_sd[f"{probe.torch_name}.weight_mask"]
    np.testing.assert_allclose(np.asarray(st.scores[probe.key]).T, ref_scores,
                               rtol=1e-4, atol=1e-7)
    ours_v = np.asarray(st.train_params["classifier"]["main_0"]["v"]).T
    np.testing.assert_allclose(ours_v, ref_sd["classifier.main.0.weight_v"],
                               rtol=1e-4, atol=1e-7)
    if loss_type == "lmh":
        # reference parity: the LMH params are NOT in the optimizer
        # (prune_debias_VQA.py:612-630 covers model params only) — both
        # sides must leave them at init
        np.testing.assert_array_equal(
            np.asarray(st.train_params["lmh"]["smooth_param"]),
            np.asarray(lmh_params["smooth_param"]))


def test_linear_warmup_schedule_oracle():
    """`train.common.linear_warmup_schedule` vs the reference's
    `get_linear_schedule_with_warmup` lambda (hg_transformers/
    optimization.py), including a real warmup ramp. `hf_adamw` reads the
    schedule at the PRE-increment count (torch LambdaLR steps after
    optimizer.step()), so compare at the same epoch index."""
    import torch as _torch
    from hg_transformers.optimization import get_linear_schedule_with_warmup

    from crvqa_tpu.train.common import linear_warmup_schedule

    lr, warmup, total = 5e-5, 7, 40
    opt = _torch.optim.SGD([_torch.nn.Parameter(_torch.zeros(1))], lr=lr)
    sched = get_linear_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total)
    ours = linear_warmup_schedule(lr, warmup, total)
    for step in range(total + 3):
        ref_lr = opt.param_groups[0]["lr"]
        # optax schedules evaluate in fp32
        assert abs(float(ours(step)) - ref_lr) <= 1e-6 * lr, step
        sched.step()


def test_stage2_trajectory_warmup_decay_accumulate_oracle(setup):
    """The full optimizer surface in one trajectory: a LIVE warmup ramp
    (step 1 at lambda(0)=0 — torch LambdaLR reads the pre-increment count),
    per-group weight decay on the post-update param at the scheduled lr
    (optimization.py:124-127), and the always-on |grad| accumulator
    (state['sum'], :100-101) vs our accumulate_abs_grad state."""
    from crvqa_tpu.train.common import abs_grad_sum

    config, model, params, specs, jb = setup
    WD, WARMUP = 0.01, 3
    sparsity = ModalSparsity.from_compression(.3, .3, .3, .7)
    masker = Masker.create(specs, sparsity, controlled_init="magnitude",
                           threshold=THRESHOLD)
    cfg = stage2.Stage2Config(masker_type="normal", learning_rate=LR,
                              total_steps=TOTAL_STEPS, warmup_steps=WARMUP,
                              weight_decay=WD, accumulate_abs_grad=True,
                              hidden_size=config.hidden_size)
    st, tx = stage2.init_state(model, masker, params, cfg,
                               jax.random.PRNGKey(1))
    lmh_params = {
        "bias_lin": {"kernel": np.zeros((config.hidden_size, 1), np.float32),
                     "bias": np.zeros((1,), np.float32)},
        "smooth_param": np.full((1,), -1.0, np.float32)}

    tm, opt, sched, lmh = _build_torch_trainer(
        config, params, specs, masker.zerorate_dict, lmh_params,
        warmup=WARMUP, weight_decay=WD)
    ref_losses = _torch_two_steps(tm, opt, sched, lmh, jb, "normal")

    step = stage2.make_train_step(model, masker, tx, cfg)
    st, m1 = step(st, jb)
    st, m2 = step(st, jb)
    np.testing.assert_allclose([float(m1.loss), float(m2.loss)], ref_losses,
                               rtol=3e-5)

    probe = specs[3]
    ref_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    np.testing.assert_allclose(np.asarray(st.scores[probe.key]).T,
                               ref_sd[f"{probe.torch_name}.weight_mask"],
                               rtol=1e-4, atol=1e-7)
    # the classifier weight saw REAL decay (nonzero lr at step 2)
    ours_v = np.asarray(st.train_params["classifier"]["main_0"]["v"]).T
    np.testing.assert_allclose(ours_v, ref_sd["classifier.main.0.weight_v"],
                               rtol=1e-4, atol=1e-7)

    # |grad| accumulator parity on the probed score tensor
    sums = abs_grad_sum(st.opt_state)
    assert sums is not None
    ref_state = {g["name"]: opt.state[g["params"][0]]
                 for g in opt.param_groups}
    ref_sum = ref_state[f"{probe.torch_name}.weight_mask"]["sum"].numpy()
    np.testing.assert_allclose(
        np.asarray(sums["scores"][probe.key]).T, ref_sum,
        rtol=1e-5, atol=1e-8)
