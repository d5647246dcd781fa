"""timm-optimizer stragglers (train/timm_optim.py) vs the reference's
vendored classes (`mPLUG/optim/adamp.py` / `sgdp.py` / `rmsprop_tf.py`)
run under torch, step-paired over 5 updates; PlateauLR vs torch
ReduceLROnPlateau decision-for-decision."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

torch = ref_oracle.install()
ref_adamp = ref_oracle.load_ref_module("ref_adamp", "mPLUG/optim/adamp.py")
ref_sgdp = ref_oracle.load_ref_module("ref_sgdp", "mPLUG/optim/sgdp.py")
ref_rmsprop = ref_oracle.load_ref_module("ref_rmsprop_tf",
                                         "mPLUG/optim/rmsprop_tf.py")

from crvqa_tpu.train import timm_optim  # noqa: E402


def _setup(seed=0, ortho=False):
    """params {w [4,6], b [6]} + 5 grad draws; ortho=True makes w's grads
    row-orthogonal to w so AdamP/SGDP's scale-invariant projection
    triggers (channel-view |cos| ~ 0 < delta/sqrt(6))."""
    rng = np.random.default_rng(seed)
    params = {"w": rng.normal(size=(4, 6)).astype(np.float32),
              "b": rng.normal(size=(6,)).astype(np.float32)}
    grads = []
    for _ in range(5):
        g = {"w": rng.normal(size=(4, 6)).astype(np.float32),
             "b": rng.normal(size=(6,)).astype(np.float32)}
        if ortho:
            w = params["w"]
            proj = (g["w"] * w).sum(1, keepdims=True) / \
                (w * w).sum(1, keepdims=True)
            g["w"] = g["w"] - proj * w
        grads.append(g)
    return params, grads


def _run_torch(opt_cls, params, grads, **kw):
    tp = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
          for k, v in params.items()}
    opt = opt_cls([tp["w"], tp["b"]], **kw)
    for g in grads:
        for k in tp:
            tp[k].grad = torch.from_numpy(g[k].copy())
        opt.step()
    return {k: v.detach().numpy() for k, v in tp.items()}


def _run_ours(tx, params, grads):
    p = jax.tree_util.tree_map(jnp.asarray, params)
    state = tx.init(p)
    step = jax.jit(lambda p, s, g: tx.update(g, s, p))
    for g in grads:
        upd, state = step(p, state, jax.tree_util.tree_map(jnp.asarray, g))
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
    return jax.tree_util.tree_map(np.asarray, p)


@pytest.mark.parametrize("ortho,nesterov,wd", [(False, False, 0.0),
                                               (True, False, 0.05),
                                               (True, True, 0.05)])
def test_adamp_matches_reference(ortho, nesterov, wd):
    params, grads = _setup(ortho=ortho)
    ref = _run_torch(ref_adamp.AdamP, params, grads, lr=0.01,
                     weight_decay=wd, nesterov=nesterov)
    ours = _run_ours(timm_optim.adamp(0.01, weight_decay=wd,
                                      nesterov=nesterov), params, grads)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
    if ortho:
        # the projection branch actually fired: trajectories must differ
        # from the never-projected run
        plain = _run_ours(timm_optim.adamp(0.01, weight_decay=wd,
                                           nesterov=nesterov, delta=-1.0),
                          params, grads)
        assert np.abs(plain["w"] - ours["w"]).max() > 1e-6


@pytest.mark.parametrize("ortho,nesterov,wd", [(False, True, 0.0),
                                               (True, True, 0.05)])
def test_sgdp_matches_reference(ortho, nesterov, wd):
    params, grads = _setup(seed=1, ortho=ortho)
    ref = _run_torch(ref_sgdp.SGDP, params, grads, lr=0.05, momentum=0.9,
                     weight_decay=wd, nesterov=nesterov)
    ours = _run_ours(timm_optim.sgdp(0.05, momentum=0.9, weight_decay=wd,
                                     nesterov=nesterov), params, grads)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("momentum,centered,wd", [(0.9, False, 0.0),
                                                  (0.9, True, 0.01),
                                                  (0.0, False, 0.01)])
def test_rmsprop_tf_matches_reference(momentum, centered, wd):
    params, grads = _setup(seed=2)
    ref = _run_torch(ref_rmsprop.RMSpropTF, params, grads, lr=0.01,
                     alpha=0.9, momentum=momentum, centered=centered,
                     weight_decay=wd)
    ours = _run_ours(
        timm_optim.rmsprop_tf(0.01, alpha=0.9, momentum=momentum,
                              centered=centered, weight_decay=wd),
        params, grads)
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


@pytest.mark.parametrize("mode,metrics", [
    ("max", [1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
    ("max", [1.0, 2.0, 3.0, 3.0, 3.0, 3.0, 3.0, 4.0, 4.0, 4.0]),
    ("min", [5.0, 4.0, 4.0, 4.0, 4.0, 4.0, 3.0, 3.0, 3.0, 3.0]),
])
def test_plateau_matches_reduce_lr_on_plateau(mode, metrics):
    """Scale trajectory == torch ReduceLROnPlateau's lr/base trajectory
    (rel threshold, patience 2, cooldown 1)."""
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode=mode, factor=0.1, patience=2, threshold=1e-4, cooldown=1)
    ours = timm_optim.PlateauLR(decay_rate=0.1, patience=2, threshold=1e-4,
                                cooldown=1, mode=mode)
    for m in metrics:
        sched.step(m)
        scale = ours.step(m)
        np.testing.assert_allclose(scale, opt.param_groups[0]["lr"],
                                   rtol=1e-9, err_msg=str(m))


def test_dynamic_scale_carrier():
    """dynamic_scale holds a jit-pure LR scale; set_dynamic_scale swaps it
    functionally through a chained optimizer state."""
    import optax

    tx = optax.chain(timm_optim.dynamic_scale(),
                     optax.sgd(learning_rate=1.0))
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    upd, _ = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -1.0)
    state2 = timm_optim.set_dynamic_scale(state, 0.1)
    upd2, _ = tx.update(g, state2, params)
    np.testing.assert_allclose(np.asarray(upd2["w"]), -0.1, rtol=1e-6)


def test_factory_accepts_stragglers():
    """The mPLUG optimizer factory surface accepts adamp/sgdp/rmsproptf
    (optim_factory.py:95-110); adahessian takes the pair-input path; an
    unknown name still raises."""
    from crvqa_tpu.train import mplug_train

    params = {"visual_encoder": {"w": jnp.ones((2, 2))},
              "text_encoder": {"w": jnp.ones((2, 2))}}
    for opt in ("adamp", "sgdp", "rmsproptf"):
        cfg = mplug_train.MPlugTrainConfig(opt=opt, total_steps=10)
        tx = mplug_train.make_two_group_adamw(cfg)
        state = tx.init(params)
        upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                           state, params)
        assert np.isfinite(np.asarray(upd["text_encoder"]["w"])).all()
    tx = mplug_train.make_two_group_adamw(
        mplug_train.MPlugTrainConfig(opt="adahessian", total_steps=10))
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update((g, g), tx.init(params), params)
    assert np.isfinite(np.asarray(upd["visual_encoder"]["w"])).all()
    with pytest.raises(ValueError):
        mplug_train.make_two_group_adamw(
            mplug_train.MPlugTrainConfig(opt="noSuchOpt", total_steps=10))


def test_adahessian_oracle():
    """The reference Adahessian (create_graph backward + its own Rademacher
    generator) vs adahessian_two_group fed the SAME z sequence (generator
    replay) and jvp-computed H@z — parameter trajectories identical."""
    ref_ah = ref_oracle.load_ref_module("ref_adahessian",
                                        "mPLUG/optim/adahessian.py")
    rng = np.random.default_rng(3)
    W0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(4,)).astype(np.float32)
    X = rng.normal(size=(8, 3)).astype(np.float32)
    Y = rng.normal(size=(8, 4)).astype(np.float32)
    steps, lr, wd = 4, 0.05, 0.01

    W = torch.nn.Parameter(torch.from_numpy(W0.copy()))
    b = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    tX, tY = torch.from_numpy(X), torch.from_numpy(Y)
    opt = ref_ah.Adahessian([W, b], lr=lr, weight_decay=wd)
    for _ in range(steps):
        opt.zero_grad()
        loss = ((torch.tanh(tX @ W.t() + b) - tY) ** 2).mean()
        loss.backward(create_graph=True)
        opt.step()

    # replay the reference's z draws (dedicated generator, seed 2147483647,
    # params iterated [W, b] each step; adahessian.py:45-46, 99)
    gen = torch.Generator().manual_seed(2147483647)
    z_seq = []
    for _ in range(steps):
        z_seq.append({
            "w": (torch.randint(0, 2, (4, 3), generator=gen) * 2.0
                  - 1.0).numpy().astype(np.float32),
            "b": (torch.randint(0, 2, (4,), generator=gen) * 2.0
                  - 1.0).numpy().astype(np.float32)})

    jX, jY = jnp.asarray(X), jnp.asarray(Y)

    def loss_fn(p):
        return ((jnp.tanh(jX @ p["w"].T + p["b"]) - jY) ** 2).mean()

    tx = timm_optim.adahessian_two_group(
        lambda c: lr, lambda c: lr,
        lambda t: {"w": "body", "b": "body"}, weight_decay=wd)
    p = {"w": jnp.asarray(W0), "b": jnp.asarray(b0)}
    state = tx.init(p)
    for z_np in z_seq:
        z = jax.tree_util.tree_map(jnp.asarray, z_np)
        grads = jax.grad(loss_fn)(p)
        _, hvp = jax.jvp(jax.grad(loss_fn), (p,), (z,))
        hess = jax.tree_util.tree_map(lambda zz, h: zz * h, z, hvp)
        upd, state = tx.update((grads, hess), state, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)

    np.testing.assert_allclose(np.asarray(p["w"]), W.detach().numpy(),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(p["b"]), b.detach().numpy(),
                               rtol=2e-5, atol=2e-6)


def test_hutchinson_exact_on_diagonal_quadratic():
    """For loss = 0.5 * sum(a * x^2), H is diag(a) and z*(H@z) == a exactly
    for any Rademacher z (z^2 == 1) — the estimator is exact, so the jvp
    plumbing has no tolerance to hide behind."""
    a = jnp.asarray([0.5, 2.0, 3.0])

    def loss_fn(t):
        return 0.5 * jnp.sum(a * t["x"] ** 2)

    t = {"x": jnp.asarray([1.0, -2.0, 0.3])}
    loss, grads, hess = timm_optim.hutchinson(
        loss_fn, t, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(hess["x"]), np.asarray(a),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["x"]),
                               np.asarray(a * t["x"]), rtol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_fn(t)), rtol=1e-6)


def test_adahessian_mplug_train_step():
    """opt='adahessian' end-to-end through the mPLUG mask-mode train step
    (jvp through the full model incl. dropout rngs): loss finite, scores
    move, head params move."""
    from crvqa_tpu.data.mplug_data import synthetic_mplug_batch
    from crvqa_tpu.masking import Masker, ModalSparsity
    from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig
    from crvqa_tpu.train import mplug_train

    config = MPlugConfig.tiny()
    model = MPlug(config)
    b = synthetic_mplug_batch(batch_size=2, image_res=config.vit.image_res,
                              vocab_size=config.bert.vocab_size)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "qid"}
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["question_ids"],
        batch["question_mask"], batch["answer_ids"], batch["answer_mask"],
        batch["weights"])["params"]
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers,
        text_encoder_layers=config.bert.text_encoder_layers,
        fusion_layers=config.bert.fusion_layers,
        decoder_layers=config.bert.text_decode_layers,
        stride_layer=config.bert.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", opt="adahessian",
                                       total_steps=10)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(1), masker=masker)
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    s0 = jax.tree_util.tree_map(np.asarray, state.scores)
    state, loss1 = step(state, batch)
    state, loss2 = step(state, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    moved = sum(float(np.abs(np.asarray(b_) - a_).max())
                for a_, b_ in zip(jax.tree_util.tree_leaves(s0),
                                  jax.tree_util.tree_leaves(state.scores)))
    assert moved > 0
