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
