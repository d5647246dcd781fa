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
