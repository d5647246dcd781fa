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
    (optim_factory.py:95-110) and still raises for adahessian."""
    from crvqa_tpu.train import mplug_train

    for opt in ("adamp", "sgdp", "rmsproptf"):
        cfg = mplug_train.MPlugTrainConfig(opt=opt, total_steps=10)
        tx = mplug_train.make_two_group_adamw(cfg)
        params = {"visual_encoder": {"w": jnp.ones((2, 2))},
                  "text_encoder": {"w": jnp.ones((2, 2))}}
        state = tx.init(params)
        upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                           state, params)
        assert np.isfinite(np.asarray(upd["text_encoder"]["w"])).all()
    with pytest.raises(ValueError):
        mplug_train.make_two_group_adamw(
            mplug_train.MPlugTrainConfig(opt="adahessian", total_steps=10))
