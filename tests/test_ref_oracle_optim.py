"""Reference-oracle parity: the mPLUG dual-LR optimizer grouping.

Runs the ACTUAL `mPLUG/optim/optim_factory.py:create_two_optimizer`
(:141-171) on a torch module tree shaped like the mPLUG naming surface
(BERT-style `LayerNorm`, CLIP-style `ln_1`, biases, mask scores, visual vs
body towers) and asserts our `two_group_labels` + `decay_mask` assign every
parameter the same (lr, weight_decay) pair.

Key quirk this pins down: the reference's no_decay test is the SUBSTRING
"LayerNorm.weight", which the CLIP visual encoder's `ln_*` norms do NOT
match — their weights ARE decayed (at lr2), unlike the BERT towers'.
"""
import sys
import types

import jax.numpy as jnp
import numpy as np

import ref_oracle

from crvqa_tpu.train.mplug_train import decay_mask, two_group_labels

torch = ref_oracle.install()

ref_oracle.add_mplug_path()

LR1, LR2, WD = 3e-5, 5e-6, 0.02


class _Tower(torch.nn.Module):
    """BERT-ish: dense (+bias), LayerNorm, and a mask-score parameter."""

    def __init__(self):
        super().__init__()
        self.dense = torch.nn.Linear(4, 4)
        self.LayerNorm = torch.nn.LayerNorm(4)
        self.weight_mask = torch.nn.Parameter(torch.zeros(4, 4))


class _Clip(torch.nn.Module):
    """CLIP-ish visual encoder: ln_1 norms + proj + class embedding."""

    def __init__(self):
        super().__init__()
        self.proj = torch.nn.Linear(4, 4)
        self.ln_1 = torch.nn.LayerNorm(4)
        self.class_embedding = torch.nn.Parameter(torch.zeros(4))


class _Model(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.visual_encoder = _Clip()
        self.text_encoder = _Tower()
        self.text_decoder = _Tower()


def _ref_groups():
    from optim import create_two_optimizer

    model = _Model()
    args = types.SimpleNamespace(weight_decay=WD, lr1=LR1, lr2=LR2)
    opt = create_two_optimizer(args, model)
    by_param = {}
    named = {id(p): n for n, p in model.named_parameters()}
    for g in opt.param_groups:
        for p in g["params"]:
            by_param[named[id(p)]] = (g["lr"], g["weight_decay"])
    # every param must be covered (the momentum-twin hole needs `_m` names,
    # which this tree doesn't use)
    assert set(by_param) == {n for n, _ in model.named_parameters()}
    return by_param


def _flax_tree():
    """The same params as _Model, in our flax naming (kernel/scale/bias)."""
    z = jnp.zeros((1,))
    tower = {"dense": {"kernel": z, "bias": z},
             "LayerNorm": {"scale": z, "bias": z},
             "weight_mask": z}
    return {
        "visual_encoder": {"proj": {"kernel": z, "bias": z},
                           "ln_1": {"scale": z, "bias": z},
                           "class_embedding": z},
        "text_encoder": dict(tower),
        "text_decoder": dict(tower),
    }


# torch name -> our flax path (kernel/scale leaf renames only)
def _torch_name(path):
    leaf = {"kernel": "weight", "scale": "weight"}.get(path[-1], path[-1])
    if path[-1] in ("kernel", "scale", "bias"):
        return ".".join(path[:-1] + (leaf,))
    return ".".join(path)


def test_two_optimizer_grouping_oracle():
    ref = _ref_groups()

    tree = _flax_tree()
    labels = two_group_labels(tree)
    decays = decay_mask(tree)

    from flax import traverse_util

    flat_labels = traverse_util.flatten_dict(labels)
    flat_decays = traverse_util.flatten_dict(decays)
    assert set(flat_labels) == set(flat_decays)

    checked = 0
    for path, label in flat_labels.items():
        tname = _torch_name(path)
        assert tname in ref, tname
        ref_lr, ref_wd = ref[tname]
        ours_lr = LR1 if label == "body" else LR2
        ours_wd = WD if flat_decays[path] else 0.0
        assert (ours_lr, ours_wd) == (ref_lr, ref_wd), (
            tname, (ours_lr, ours_wd), (ref_lr, ref_wd))
        checked += 1
    assert checked == len(ref)

    # the pinned quirk, explicitly: CLIP norm weights decay, BERT's don't
    assert ref["visual_encoder.ln_1.weight"] == (LR2, WD)
    assert ref["text_encoder.LayerNorm.weight"] == (LR1, 0.0)
    # and mask scores decay at their tower's lr
    assert ref["text_encoder.weight_mask"] == (LR1, WD)


def test_two_optimizer_inner_math_is_torch_adamw():
    """create_two_optimizer hardcodes torch.optim.AdamW (optim_factory.py:
    170) regardless of the yaml opt; our two-group optimizer's default
    'adamw' inner transform must follow the same trajectory, per group."""
    from crvqa_tpu.train.mplug_train import MPlugTrainConfig, make_two_group_adamw

    rng = np.random.default_rng(0)
    w_body = rng.normal(size=(4, 3)).astype(np.float32)
    w_vis = rng.normal(size=(3, 3)).astype(np.float32)
    grads = [
        {"visual_encoder": {"proj": {"kernel": rng.normal(size=(3, 3)).astype(np.float32)}},
         "body": {"dense": {"kernel": rng.normal(size=(4, 3)).astype(np.float32)}}}
        for _ in range(3)
    ]

    # torch side: two AdamW groups exactly like create_two_optimizer
    t_body = torch.nn.Parameter(torch.from_numpy(w_body.copy()))
    t_vis = torch.nn.Parameter(torch.from_numpy(w_vis.copy()))
    opt = torch.optim.AdamW([
        {"params": [t_body], "weight_decay": WD, "lr": LR1},
        {"params": [t_vis], "weight_decay": WD, "lr": LR2},
    ])
    for g in grads:
        t_body.grad = torch.from_numpy(g["body"]["dense"]["kernel"].copy())
        t_vis.grad = torch.from_numpy(
            g["visual_encoder"]["proj"]["kernel"].copy())
        opt.step()

    # ours: constant-lr via the epoch-exact 'step' schedule with no warmup
    # and decay_rate 1 (the legacy step-granular surface clamps warmup>=1,
    # which would run the first update at lr 0)
    cfg = MPlugTrainConfig(lr1=LR1, lr2=LR2, weight_decay=WD,
                           sched="step", decay_rate=1.0,
                           steps_per_epoch=1, epochs=10**6,
                           warmup_epochs=0, decay_epochs=10**6,
                           max_grad_norm=1e9)
    tx = make_two_group_adamw(cfg)
    params = {"visual_encoder": {"proj": {"kernel": jnp.asarray(w_vis)}},
              "body": {"dense": {"kernel": jnp.asarray(w_body)}}}
    state = tx.init(params)
    import optax

    for g in grads:
        updates, state = tx.update(
            {"visual_encoder": {"proj": {"kernel": jnp.asarray(g["visual_encoder"]["proj"]["kernel"])}},
             "body": {"dense": {"kernel": jnp.asarray(g["body"]["dense"]["kernel"])}}},
            state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["body"]["dense"]["kernel"]),
        t_body.detach().numpy(), rtol=2e-5, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(params["visual_encoder"]["proj"]["kernel"]),
        t_vis.detach().numpy(), rtol=2e-5, atol=1e-9)
