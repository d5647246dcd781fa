"""bf16 dtype-policy coverage: the bench/production path (bf16 activations,
fp32 params/logits) must run and track the fp32 path."""
import jax
import jax.numpy as jnp
import numpy as np

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.train import stage2


def test_bf16_forward_and_step_tracks_fp32():
    cfg32 = LxmertConfig.tiny()
    cfg16 = LxmertConfig.tiny(dtype=jnp.bfloat16)
    b = synthetic_batch(batch_size=4, vocab_size=cfg32.vocab_size,
                        ans_num=cfg32.ans_num, feat_dim=cfg32.visual_feat_dim,
                        pos_dim=cfg32.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    m32, m16 = LxmertForVQA(cfg32), LxmertForVQA(cfg16)
    params = m32.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                      visual_feats=jb["visual_feats"],
                      visual_pos=jb["visual_pos"])["params"]
    lo32, po32 = m32.apply({"params": params}, input_ids=jb["input_ids"],
                           visual_feats=jb["visual_feats"],
                           visual_pos=jb["visual_pos"], deterministic=True)
    # same fp32 params through the bf16 compute path
    lo16, po16 = m16.apply({"params": params}, input_ids=jb["input_ids"],
                           visual_feats=jb["visual_feats"],
                           visual_pos=jb["visual_pos"], deterministic=True)
    assert lo16.dtype == jnp.float32  # logits forced to fp32
    assert np.isfinite(np.asarray(lo16)).all()
    # bf16 tracks fp32 within bf16 tolerance
    np.testing.assert_allclose(np.asarray(lo16), np.asarray(lo32),
                               rtol=0.1, atol=0.2)

    # full stage-2 step under bf16 trains with finite loss
    specs = lxmert_mask_specs(cfg16.l_layers, cfg16.r_layers, cfg16.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")
    scfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                               hidden_size=cfg16.hidden_size)
    state, tx = stage2.init_state(m16, masker, params, scfg,
                                  jax.random.PRNGKey(1))
    step = stage2.make_train_step(m16, masker, tx, scfg)
    state, metrics = step(state, jb)
    assert np.isfinite(float(metrics.loss))
    # scores/thresholds stay fp32 regardless of compute dtype
    assert state.scores["lxmert/pooler/dense/kernel"].dtype == jnp.float32
    assert state.thresholds["lxmert/pooler/dense/kernel"].dtype == jnp.float32


def test_stage2_bf16_backbone_tracks_fp32():
    """backbone_dtype='bfloat16' (the masked-apply HBM-traffic halving mode)
    must track the fp32 path closely and keep scores/thresholds fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    batch = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                            ans_num=config.ans_num,
                            feat_dim=config.visual_feat_dim,
                            pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    masker = Masker.create(specs,
                           ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
                           controlled_init="magnitude")

    outs = {}
    for bd in ("float32", "bfloat16"):
        cfg = stage2.Stage2Config(masker_type="normal", total_steps=4,
                                  hidden_size=config.hidden_size,
                                  backbone_dtype=bd)
        state, tx = stage2.init_state(model, masker, params, cfg,
                                      jax.random.PRNGKey(0))
        if bd == "bfloat16":
            leaf = jax.tree_util.tree_leaves(state.frozen_params)[0]
            assert leaf.dtype == jnp.bfloat16
            assert state.scores[specs[0].key].dtype == jnp.float32
            assert state.train_params["classifier"][
                list(state.train_params["classifier"])[0]]
        step = stage2.make_train_step(model, masker, tx, cfg)
        state, m = step(state, jb)
        state, m = step(state, jb)
        outs[bd] = float(m.loss)
    # bf16 weight quantization shifts the loss slightly, not wildly
    assert np.isfinite(outs["bfloat16"])
    assert abs(outs["bfloat16"] - outs["float32"]) < 0.15 * abs(
        outs["float32"]) + 0.05


def test_gelu_dtype_dispatch():
    """layers.gelu: exact erf form in fp32 (reference parity — the oracle
    suite runs fp32), tanh form in bf16 (erf measured 12% of the whole
    stage-2 step on v5e: 3050 vs 3469 ex/s)."""
    from flax import linen as nn

    from crvqa_tpu.models import layers

    x32 = jnp.asarray(np.linspace(-6, 6, 4001), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(layers.gelu(x32)),
        np.asarray(nn.gelu(x32, approximate=False)))
    x16 = x32.astype(jnp.bfloat16)
    assert layers.gelu(x16).dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(layers.gelu(x16), np.float32),
        np.asarray(nn.gelu(x16, approximate=True), np.float32))
    # coarse numerics bound vs the bf16 erf form we could have shipped
    # instead: absolute deviation never exceeds 2 bf16 ulps of O(1)
    # activations anywhere (0.0156 at |y|~2), and stays under 3.5e-3 in the
    # small-output tail (where the tanh form's bf16 `1+tanh` cancellation
    # flushes exponentially small values to 0). Elementwise, deviations sit
    # at the same scale as bf16's own rounding; the end-to-end training
    # consequence is bounded by test_bf16_tanh_gelu_guard below.
    e16 = np.asarray(nn.gelu(x16, approximate=False), np.float32)
    d = np.abs(np.asarray(layers.gelu(x16), np.float32) - e16)
    assert d.max() <= 2.0 ** -6
    assert d[np.abs(e16) < 0.02].max() < 3.5e-3


def test_bf16_tanh_gelu_guard(monkeypatch):
    """End-to-end numerics guard for the bf16 tanh-gelu dispatch: stage-2
    loss and score gradients under bf16-tanh must track bf16-erf within
    bf16 rounding noise (the fp32 oracle path is untouched by the switch)."""
    from flax import linen as nn

    from crvqa_tpu.models import layers

    config = LxmertConfig.tiny(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")

    def run():
        cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                                  hidden_size=config.hidden_size)
        st, tx = stage2.init_state(model, masker, params, cfg,
                                   jax.random.PRNGKey(1))
        step = stage2.make_train_step(model, masker, tx, cfg)
        st, m = step(st, jb)
        return float(m.loss), np.asarray(st.scores[specs[3].key])

    loss_tanh, s_tanh = run()
    monkeypatch.setitem(layers.ACT2FN, "gelu",
                        lambda x: nn.gelu(x, approximate=False))
    loss_erf, s_erf = run()
    assert np.isfinite(loss_tanh)
    np.testing.assert_allclose(loss_tanh, loss_erf, rtol=5e-3)
    assert np.abs(s_tanh - s_erf).max() < 5e-4
