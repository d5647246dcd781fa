"""MFU accounting helpers (utils/mfu.py) — the denominator every benchmark
surface shares (bench.py + benchmarks/bench_{mplug,generate,visualbert,
stage1}.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.utils import mfu as M


def test_peak_flops_device_kinds():
    assert M.peak_flops("TPU v5 lite0") == 197e12
    assert M.peak_flops("TPU v5p") == 459e12
    assert M.peak_flops("TPU v6 lite") == 918e12
    assert M.peak_flops("TPU v4") == 275e12
    # unknown kinds fall back to the conservative v5e number
    assert M.peak_flops("cpu") == 197e12


def test_lowered_flops_counts_matmul():
    """XLA cost analysis of a plain matmul = 2*M*N*K MACs-as-flops."""
    m, k, n = 128, 256, 512
    a = jnp.ones((m, k), jnp.float32)
    b = jnp.ones((k, n), jnp.float32)
    f = jax.jit(lambda a, b: a @ b)
    flops = M.lowered_flops(f, a, b)
    assert flops == pytest.approx(2 * m * k * n, rel=0.01)


def test_lowered_flops_scan_body_counted_once():
    """The documented caveat: a lax.scan body is counted once regardless of
    trip count — benches must count the single step and multiply."""
    a = jnp.ones((128, 128), jnp.float32)

    def once(a):
        return a @ a

    def scanned(a):
        def body(c, _):
            return c @ c, ()
        c, _ = jax.lax.scan(body, a, None, length=16)
        return c

    f1 = M.lowered_flops(jax.jit(once), a)
    f16 = M.lowered_flops(jax.jit(scanned), a)
    assert f1 > 0
    assert f16 < 2.5 * f1  # NOT ~16x: the body is counted once


def test_mfu_math():
    assert M.mfu(0.0, 4, 1.0, "TPU v5 lite") is None
    assert M.mfu(197e12, 1, 2.0, "TPU v5 lite") == pytest.approx(0.5)
    assert M.mfu(197e12, 4, 4.0, "TPU v5 lite") == pytest.approx(1.0)


def test_stage1_multi_step_matches_single_steps():
    """stage1.make_multi_step (one scan dispatch) must reproduce the
    per-step loop exactly — same final params, same per-step losses."""
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage1

    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    batches = [synthetic_batch(
        batch_size=4, seed=i, vocab_size=config.vocab_size,
        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
        pos_dim=config.visual_pos_dim) for i in range(3)]
    jb = [{k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
          for b in batches]
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jb[0]["input_ids"],
        visual_feats=jb[0]["visual_feats"],
        visual_pos=jb[0]["visual_pos"])["params"]
    cfg = stage1.Stage1Config(ft_type="lmh", total_steps=10, warmup_steps=2,
                              hidden_size=config.hidden_size,
                              learning_rate=1e-3)

    state_a, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1))
    step = stage1.make_train_step(model, cfg, tx)
    single_losses = []
    for b in jb:
        state_a, m = step(state_a, b)
        single_losses.append(float(m.loss))

    state_b, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1))
    multi = stage1.make_multi_step(model, cfg, tx, n_steps=3)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *jb)
    state_b, losses, _ = multi(state_b, stacked)

    np.testing.assert_allclose(np.asarray(losses), single_losses, rtol=2e-5)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=2e-5, atol=2e-6)
