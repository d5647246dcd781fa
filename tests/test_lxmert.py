"""LXMERT model tests: shapes, param-path <-> mask-spec consistency, sharing
of the cross-attention module, weight-norm classifier parameterization."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA


def _init(config):
    model = LxmertForVQA(config)
    batch = synthetic_batch(
        batch_size=2, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_feat_dim, pos_dim=config.visual_pos_dim,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_feats=jnp.asarray(batch["visual_feats"]),
        visual_pos=jnp.asarray(batch["visual_pos"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
    )["params"]
    return model, params, batch


def test_forward_shapes_tiny():
    config = LxmertConfig.tiny()
    model, params, batch = _init(config)
    logits, pooled = model.apply(
        {"params": params},
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_feats=jnp.asarray(batch["visual_feats"]),
        visual_pos=jnp.asarray(batch["visual_pos"]),
        attention_mask=jnp.asarray(batch["attention_mask"]),
        deterministic=True,
    )
    assert logits.shape == (2, config.ans_num)
    assert pooled.shape == (2, config.hidden_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_mask_specs_exist_in_params():
    """Every path from lxmert_mask_specs must resolve to a real param leaf —
    the consistency the reference gets implicitly from module-name matching."""
    config = LxmertConfig.tiny()
    _, params, _ = _init(config)
    flat = traverse_util.flatten_dict(params)
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    # tiny: 2*6 lang + 1*6 vis + 1*16 fus + E + VV + VB + P = 38 matrices
    assert len(specs) == 38
    for spec in specs:
        assert spec.path in flat, f"missing {spec.path}"
        assert flat[spec.path].ndim == 2


def test_full_size_spec_count():
    # full LXMERT: 9*6 + 5*6 + 5*16 + 4 = 168 masked matrices
    specs = lxmert_mask_specs()
    assert len(specs) == 168
    torch_names = {s.torch_name for s in specs}
    assert "lxmert.encoder.x_layers.4.visual_attention.att.query" in torch_names
    assert "lxmert.embeddings.word_embeddings" in torch_names
    assert "lxmert.pooler.dense" in torch_names


def test_cross_attention_params_shared():
    """LxmertXLayer uses ONE visual_attention for both directions
    (modeling_lxmert.py:947-958) — so there must be exactly one set of
    query/key/value params per x-layer cross attention."""
    config = LxmertConfig.tiny()
    _, params, _ = _init(config)
    x0 = params["lxmert"]["encoder"]["x_layers_0"]
    assert set(x0.keys()) == {
        "visual_attention", "lang_self_att", "visn_self_att",
        "lang_inter", "lang_output", "visn_inter", "visn_output",
    }
    assert set(x0["visual_attention"].keys()) == {"att", "output"}


def test_attention_mask_effect():
    """Padding tokens must not change non-pad outputs' attention targets."""
    config = LxmertConfig.tiny()
    model, params, batch = _init(config)

    def run(mask):
        logits, _ = model.apply(
            {"params": params},
            input_ids=jnp.asarray(batch["input_ids"]),
            visual_feats=jnp.asarray(batch["visual_feats"]),
            visual_pos=jnp.asarray(batch["visual_pos"]),
            attention_mask=jnp.asarray(mask),
            deterministic=True,
        )
        return np.asarray(logits)

    mask = batch["attention_mask"].copy()
    mask[:, -4:] = 0.0
    base = run(mask)
    ids2 = batch["input_ids"].copy()
    ids2[:, -1] = (ids2[:, -1] + 1) % config.vocab_size
    batch["input_ids"] = ids2
    perturbed = run(mask)
    np.testing.assert_allclose(base, perturbed, atol=1e-5)


def test_weight_norm_classifier_matches_torch_param():
    """W = g * V/||V||_F with scalar g (torch weight_norm dim=None)."""
    import torch
    from crvqa_tpu.models.layers import WeightNormDense

    x = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    mod = WeightNormDense(5)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    lin = torch.nn.Linear(8, 5)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(np.asarray(params["v"]).T))
        lin.bias.copy_(torch.tensor(np.asarray(params["bias"])))
    wn = torch.nn.utils.weight_norm(lin, dim=None)
    with torch.no_grad():
        wn.weight_g.copy_(torch.tensor(np.asarray(params["g"])[0]))
        theirs = wn(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_joint_cross_attention_equivalence(monkeypatch):
    """layers.JOINT_CROSS_ATTENTION batches both directions of the shared
    visual_attention module into one projection set over the [lang; visn]
    concat: identical param tree and (deterministic) logits vs the two-call
    path, with and without the fused kernel."""
    from crvqa_tpu.models import layers

    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    inputs = dict(input_ids=jnp.asarray(b["input_ids"]),
                  visual_feats=jnp.asarray(b["visual_feats"]),
                  visual_pos=jnp.asarray(b["visual_pos"]),
                  attention_mask=jnp.asarray(b["attention_mask"]))
    init_in = {k: v for k, v in inputs.items() if k != "attention_mask"}
    params = model.init(jax.random.PRNGKey(0), **init_in)["params"]
    ref = np.asarray(model.apply({"params": params}, **inputs,
                                 deterministic=True)[0])

    monkeypatch.setattr(layers, "JOINT_CROSS_ATTENTION", True)
    p2 = model.init(jax.random.PRNGKey(0), **init_in)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    out = np.asarray(model.apply({"params": params}, **inputs,
                                 deterministic=True)[0])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    monkeypatch.setattr(layers, "FUSED_ATTENTION", True)
    monkeypatch.setattr(layers, "FUSED_ATTENTION_INTERPRET", True)
    out2 = np.asarray(model.apply({"params": params}, **inputs,
                                  deterministic=True)[0])
    np.testing.assert_allclose(out2, ref, rtol=1e-3, atol=1e-3)


def test_bqhk_layout_handles_causal_bias(monkeypatch):
    """Review finding: the 'bqhk' einsum spelling reshaped every 4D bias to
    [B,1,1,K], a size mismatch for causal [B,1,L,L] biases (mPLUG decoder).
    All three layouts must agree on both bias kinds."""
    from crvqa_tpu.models import layers

    mod = layers.MultiHeadAttention(num_heads=2, head_size=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    causal = jnp.where(jnp.tril(jnp.ones((5, 5))) > 0, 0.0, -10000.0)
    causal = jnp.broadcast_to(causal[None, None], (2, 1, 5, 5))
    keywise = jnp.zeros((2, 1, 1, 5)).at[:, :, :, 4:].set(-10000.0)
    p = mod.init(jax.random.PRNGKey(0), x, x)
    outs = {}
    for layout in ("bqhd", "bhqd", "bqhk"):
        monkeypatch.setattr(layers, "ATTN_LAYOUT", layout)
        outs[layout] = (np.asarray(mod.apply(p, x, x, causal)),
                        np.asarray(mod.apply(p, x, x, keywise)))
    for layout in ("bhqd", "bqhk"):
        for i in range(2):
            np.testing.assert_allclose(outs[layout][i], outs["bqhd"][i],
                                       rtol=1e-5, atol=1e-6, err_msg=layout)


def test_pad_frozen_embed_grad_semantics():
    """PadFrozenEmbed == nn.Embed values; torch padding_idx grad semantics:
    the pad row's grad is exactly zero, every other gathered row's grad is
    the plain-Embed grad (`modeling_lxmert.py:734-736` nn.Embedding
    padding_idx). Guards the activation-masked spelling (no table copy)."""
    import flax.linen as nn

    from crvqa_tpu.models.layers import PadFrozenEmbed

    pad = 3
    ids = jnp.asarray([[0, 3, 5, 3], [7, 1, 3, 0]])
    mod = PadFrozenEmbed(8, 4, pad_idx=pad)
    plain = nn.Embed(8, 4)
    v = mod.init(jax.random.PRNGKey(0), ids)
    np.testing.assert_array_equal(np.asarray(mod.apply(v, ids)),
                                  np.asarray(plain.apply(v, ids)))

    def loss(params, module):
        out = module.apply(params, ids)
        return jnp.sum(out * (1.0 + jnp.arange(out.size).reshape(out.shape)))

    g = jax.grad(loss)(v, mod)["params"]["embedding"]
    g_plain = jax.grad(loss)(v, plain)["params"]["embedding"]
    np.testing.assert_array_equal(np.asarray(g[pad]), np.zeros(4))
    rows = np.asarray([r for r in range(8) if r != pad])
    np.testing.assert_allclose(np.asarray(g)[rows], np.asarray(g_plain)[rows],
                               rtol=1e-6)
    # numpy-leaf interop path (torch-loaded checkpoints)
    v_np = jax.tree.map(np.asarray, v)
    np.testing.assert_array_equal(np.asarray(mod.apply(v_np, ids)),
                                  np.asarray(mod.apply(v, ids)))
