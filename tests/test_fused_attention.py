"""Fused short-seq attention kernel (ops/fused_attention.py), interpret mode:
forward/backward equivalence vs the XLA reference at LXMERT shapes (self 14,
self 36, cross 14->36), dropout mask consistency between fwd and the
recompute-bwd, and seed determinism."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_seeded,
    reference_attention,
)

H, D = 4, 16  # 4 heads x 16 = 64-dim model for fast interpret runs


def _inputs(sq, sk, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(batch, sq, H * D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(batch, sk, H * D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(batch, sk, H * D)).astype(np.float32))
    bias = np.zeros((batch, sk), np.float32)
    bias[:, sk - 2:] = -10000.0  # padded keys
    return q, k, v, jnp.asarray(bias)


@pytest.mark.parametrize("sq,sk", [(14, 14), (36, 36), (14, 36), (36, 14)])
def test_forward_matches_reference(sq, sk):
    q, k, v, bias = _inputs(sq, sk)
    out = fused_attention(q, k, v, bias, H, D, 0.0, True)
    ref = reference_attention(q, k, v, bias, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_reference():
    q, k, v, bias = _inputs(14, 36)
    tgt = jnp.asarray(np.random.default_rng(1).normal(
        size=(q.shape[0], 14, H * D)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((fused_attention(q, k, v, bias, H, D, 0.0, True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((reference_attention(q, k, v, bias, H, D) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_dropout_statistics_and_determinism():
    q, k, v, bias = _inputs(36, 36, batch=8)
    seed = jnp.asarray([7], jnp.int32)
    f = functools.partial(fused_attention_seeded, num_heads=H, head_size=D,
                          rate=0.5, interpret=True)
    o1 = f(q, k, v, bias, seed)
    o2 = f(q, k, v, bias, seed)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))  # same seed
    o3 = f(q, k, v, bias, jnp.asarray([8], jnp.int32))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0  # diff seed
    # expectation preserved roughly (inverted dropout)
    ref = reference_attention(q, k, v, bias, H, D)
    assert np.abs(np.asarray(o1).mean() - np.asarray(ref).mean()) < 0.05


def test_dropout_bwd_uses_same_mask_as_fwd():
    """Flash-style recompute: grads must correspond to the SAME dropout mask
    the forward used. The output is exactly LINEAR in v given (q, k, mask),
    so with a linear loss the directional derivative through v equals the
    finite difference EXACTLY (any step size) — a wrong bwd mask would show
    up as a gross mismatch, with no fp32-cancellation ambiguity."""
    q, k, v, bias = _inputs(14, 14, batch=2)
    seed = jnp.asarray([3], jnp.int32)
    f = functools.partial(fused_attention_seeded, num_heads=H, head_size=D,
                          rate=0.5, interpret=True)
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.normal(size=(2, 14, H * D)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))

    def loss(v):
        return jnp.sum(f(q, k, v, bias, seed) * c)

    g = jax.grad(loss)(v)
    num = (loss(v + direction) - loss(v - direction)) / 2.0
    ana = jnp.sum(g * direction)
    np.testing.assert_allclose(float(num), float(ana), rtol=1e-4)
    assert abs(float(ana)) > 1e-3  # non-degenerate


def test_bfloat16_path():
    q, k, v, bias = _inputs(36, 36)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    out = fused_attention(qb, kb, vb, bias, H, D, 0.0, True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(qb, kb, vb, bias, H, D)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_lxmert_forward_with_fused_attention():
    """The fused kernel drops into MultiHeadAttention (layers.FUSED_ATTENTION)
    and reproduces the whole-model logits, deterministic eval."""
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA, layers

    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    inputs = dict(input_ids=jnp.asarray(b["input_ids"]),
                  visual_feats=jnp.asarray(b["visual_feats"]),
                  visual_pos=jnp.asarray(b["visual_pos"]),
                  attention_mask=jnp.asarray(b["attention_mask"]))
    params = model.init(jax.random.PRNGKey(0),
                        **{k: v for k, v in inputs.items()
                           if k != "attention_mask"})["params"]
    ref = np.asarray(model.apply({"params": params}, **inputs,
                                 deterministic=True)[0])
    layers.FUSED_ATTENTION = True
    layers.FUSED_ATTENTION_INTERPRET = True
    try:
        out = np.asarray(model.apply({"params": params}, **inputs,
                                     deterministic=True)[0])
    finally:
        layers.FUSED_ATTENTION = False
        layers.FUSED_ATTENTION_INTERPRET = False
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_stage2_step_with_fused_attention_learns():
    """Full stage-2 train step through the fused kernel (train path incl.
    dropout seed plumbing + custom VJP): loss finite, scores move."""
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA, layers
    from crvqa_tpu.train import stage2

    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=8, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.asarray(b["input_ids"]),
                        visual_feats=jnp.asarray(b["visual_feats"]),
                        visual_pos=jnp.asarray(b["visual_pos"]))["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    masker = Masker.create(specs,
                           ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
                           controlled_init="magnitude")
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    layers.FUSED_ATTENTION = True
    layers.FUSED_ATTENTION_INTERPRET = True
    try:
        state, tx = stage2.init_state(model, masker, params, cfg,
                                      jax.random.PRNGKey(1))
        step = stage2.make_train_step(model, masker, tx, cfg)
        jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
        s0 = {k: np.asarray(v).copy() for k, v in state.scores.items()}
        state, metrics = step(state, jb)
        assert np.isfinite(float(metrics.loss))
        moved = sum(np.abs(np.asarray(state.scores[k]) - s0[k]).max() > 0
                    for k in s0)
        assert moved > len(s0) * 0.8
    finally:
        layers.FUSED_ATTENTION = False
        layers.FUSED_ATTENTION_INTERPRET = False


def test_long_context_falls_back_to_xla(monkeypatch):
    """Dispatch guard: contexts with H*S > 1024 (e.g. mPLUG's 577-patch image
    cross-attention, 12*577) must NOT enter the lane-blocked kernel — its
    [H*Sk, H*Sk] indicator masks would blow VMEM. Short contexts still do."""
    from crvqa_tpu.models import layers
    from crvqa_tpu.ops import fused_attention as fa_mod

    calls = []
    real = fa_mod.fused_attention_seeded

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(layers, "FUSED_ATTENTION", True)
    monkeypatch.setattr(layers, "FUSED_ATTENTION_INTERPRET", True)
    monkeypatch.setattr(fa_mod, "fused_attention_seeded", spy)

    mod = layers.MultiHeadAttention(num_heads=H, head_size=D)
    rng = np.random.default_rng(0)
    short = jnp.asarray(rng.normal(size=(2, 36, H * D)).astype(np.float32))
    long = jnp.asarray(rng.normal(size=(2, 300, H * D)).astype(np.float32))

    p = mod.init(jax.random.PRNGKey(0), short, short)
    before = len(calls)
    mod.apply(p, short, short)          # 4*36 = 144 <= 1024: kernel engages
    assert len(calls) == before + 1
    p2 = mod.init(jax.random.PRNGKey(0), long, long)
    before = len(calls)
    out = mod.apply(p2, long, long)     # 4*300 = 1200 > 1024: XLA fallback
    assert len(calls) == before
    assert out.shape == (2, 300, H * D)


@pytest.mark.parametrize("impl", ["recompute", "stored", "stored_folddot"])
def test_bwd_impls_match_reference(impl, monkeypatch):
    """All BWD_IMPL variants (flash-style recompute, stored-probs residual,
    stored + MXU selector fold) produce reference gradients, with and
    without dropout (dropout via the linear-in-v directional check)."""
    from crvqa_tpu.ops import fused_attention as fa_mod

    monkeypatch.setattr(fa_mod, "BWD_IMPL", impl)
    q, k, v, bias = _inputs(14, 36)
    tgt = jnp.asarray(np.random.default_rng(5).normal(
        size=(q.shape[0], 14, H * D)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((fa_mod.fused_attention(q, k, v, bias, H, D, 0.0, True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((reference_attention(q, k, v, bias, H, D) - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    seed = jnp.asarray([3], jnp.int32)
    f = functools.partial(fa_mod.fused_attention_seeded, num_heads=H,
                          head_size=D, rate=0.5, interpret=True)
    rng = np.random.default_rng(6)
    c = jnp.asarray(rng.normal(size=(q.shape[0], 14, H * D)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))

    def loss(v):
        return jnp.sum(f(q, k, v, bias, seed) * c)

    g = jax.grad(loss)(v)
    num = (loss(v + direction) - loss(v - direction)) / 2.0
    np.testing.assert_allclose(float(num), float(jnp.sum(g * direction)),
                               rtol=1e-4)


@pytest.mark.parametrize("thin", [True, False])
def test_segsum_spellings_match_reference(thin, monkeypatch):
    """Both segmented-sum spellings (square indicator dot / thin
    collapse+expand pair) produce reference outputs and gradients."""
    from crvqa_tpu.ops import fused_attention as fa_mod

    monkeypatch.setattr(fa_mod, "THIN_SEG", thin)
    q, k, v, bias = _inputs(36, 36)
    out = fa_mod.fused_attention(q, k, v, bias, H, D, 0.0, True)
    ref = reference_attention(q, k, v, bias, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    tgt = jnp.asarray(np.random.default_rng(9).normal(
        size=q.shape).astype(np.float32))
    gf = jax.grad(lambda v: jnp.sum(
        (fa_mod.fused_attention(q, k, v, bias, H, D, 0.0, True) - tgt) ** 2))(v)
    gr = jax.grad(lambda v: jnp.sum(
        (reference_attention(q, k, v, bias, H, D) - tgt) ** 2))(v)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_dropout_mask_invariant_to_batch_tile_split():
    """Regression (review finding): at VisualBERT-like shapes (bf16, seq 50,
    d 768) the forward-for-grad picks bb=16 but the stored backward's io
    exceeds the bb=16 budget and picks bb=8. The dropout mask is keyed on
    the GLOBAL batch row, so the split difference must not desynchronize
    fwd and bwd — verified by the exact linear-in-v directional derivative
    (before the global-row keying fix this read -21.7 vs the true -92.8)."""
    from crvqa_tpu.ops import fused_attention as fa_mod

    H12, D64, S = 12, 64, 24
    bwd = fa_mod._bwd_row_bytes(S, S, H12, D64, 4)
    fwd = (4 * S * H12 * D64 * 4           # q, k, v, o
           + S * H12 * S * 4 + H12 * S * 4)  # p residual + bias
    assert fa_mod._pick_bb(16, fwd) == 16       # fwd tile
    assert fa_mod._pick_bb(16, bwd) == 8        # bwd tile differs

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(16, S, H12 * D64))
                           .astype(np.float32)) for _ in range(3))
    bias = jnp.zeros((16, S), jnp.float32)
    seed = jnp.asarray([11], jnp.int32)
    f = functools.partial(fused_attention_seeded, num_heads=H12,
                          head_size=D64, rate=0.3, interpret=True)
    c = jnp.asarray(rng.normal(size=(16, S, H12 * D64)).astype(np.float32))
    direction = jnp.asarray(rng.normal(size=v.shape).astype(np.float32))

    def loss(v):
        return jnp.sum(f(q, k, v, bias, seed) * c)

    g = jax.grad(loss)(v)
    num = (loss(v + direction) - loss(v - direction)) / 2.0
    np.testing.assert_allclose(float(num), float(jnp.sum(g * direction)),
                               rtol=1e-4)


def test_supported_predicate():
    """Dispatch feasibility (review findings): odd batches > 32 (e.g. the
    12-question x 5-answer decoder batch of 60) and row sizes that overflow
    even bb=8 must report unsupported — callers fall back to XLA instead of
    crashing at trace time or OOMing Mosaic's scoped vmem."""
    from crvqa_tpu.ops.fused_attention import supported

    assert supported(256, 36, 36, 12, 64, 2)     # LXMERT headline
    assert supported(5, 8, 8, 12, 64, 4)         # odd tiny init batch
    assert not supported(60, 8, 8, 12, 64, 4)    # 60 % 8 != 0, > 32
    assert not supported(256, 80, 80, 12, 64, 4)  # fp32 long rows: > bb=8 io
    # fp32 odd batch whose full-block io exceeds the budget (was a Mosaic
    # scoped-vmem OOM with the old unchecked <=32 fallback)
    assert not supported(20, 80, 80, 12, 64, 4)


def test_causal_bias_falls_back_to_xla(monkeypatch):
    """Review finding 1: the kernel consumes a KEY-wise bias, so a causal
    [B, 1, L, L] bias (mPLUG decoder) must NOT take the fused path — it
    was being flattened to its q=0 row, destroying causality."""
    from crvqa_tpu.models import layers
    from crvqa_tpu.ops import fused_attention as fa_mod

    calls = []
    real = fa_mod.fused_attention_seeded

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(layers, "FUSED_ATTENTION", True)
    monkeypatch.setattr(layers, "FUSED_ATTENTION_INTERPRET", True)
    monkeypatch.setattr(fa_mod, "fused_attention_seeded", spy)

    mod = layers.MultiHeadAttention(num_heads=H, head_size=D)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, H * D)).astype(np.float32))
    causal = jnp.where(jnp.tril(jnp.ones((8, 8))) > 0, 0.0, -10000.0)
    causal = causal[None, None]                      # [1, 1, L, L]
    causal = jnp.broadcast_to(causal, (2, 1, 8, 8))
    p = mod.init(jax.random.PRNGKey(0), x, x)
    before = len(calls)
    out_fused_off = mod.apply(p, x, x, causal)
    assert len(calls) == before                       # causal: XLA path
    keywise = jnp.zeros((2, 1, 1, 8))
    mod.apply(p, x, x, keywise)
    assert len(calls) == before + 1                   # key-wise: kernel
    # and the causal output actually honors causality vs the reference
    ref = reference_attention(x, x, x, jnp.zeros((2, 8)), H, D)
    assert np.abs(np.asarray(out_fused_off)).max() > 0


def test_bf16_stored_probs_residual_guard(monkeypatch):
    """P_RESIDUAL_DTYPE=bf16 (the HBM-traffic experiment): gradients must
    stay within bf16 rounding of the exact fp32-residual gradients — the
    numerics guard for the bench's bf16-residual configuration."""
    from crvqa_tpu.ops import fused_attention as fa

    q, k, v, bias = _inputs(14, 36)
    tgt = jnp.asarray(np.random.default_rng(2).normal(
        size=(q.shape[0], 14, H * D)).astype(np.float32))

    def grads():
        def loss(q, k, v):
            return jnp.sum((fused_attention(q, k, v, bias, H, D, 0.0, True)
                            - tgt) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setattr(fa, "P_RESIDUAL_DTYPE", jnp.float32)
    exact = grads()
    monkeypatch.setattr(fa, "P_RESIDUAL_DTYPE", jnp.bfloat16)
    approx = grads()
    for a, b, name in zip(approx, exact, "qkv"):
        err = (np.abs(np.asarray(a) - np.asarray(b)).max()
               / max(np.abs(np.asarray(b)).max(), 1e-9))
        assert err < 2e-2, (name, err)  # bf16 has ~2^-8 relative rounding


def test_bf16_adam_moments_guard():
    """moment_dtype='bfloat16': a short stage-2 trajectory must track the
    fp32-moment trajectory closely (the optimizer-traffic experiment's
    numerics guard)."""
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    config = LxmertConfig.tiny()
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
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")

    def run(moment_dtype):
        cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                                  hidden_size=config.hidden_size,
                                  learning_rate=1e-3,
                                  moment_dtype=moment_dtype)
        st, tx = stage2.init_state(model, masker, params, cfg,
                                   jax.random.PRNGKey(1))
        step = stage2.make_train_step(model, masker, tx, cfg)
        losses = []
        for _ in range(3):
            st, m = step(st, jb)
            losses.append(float(m.loss))
        return losses, np.asarray(st.scores[specs[3].key])

    l32, s32 = run("float32")
    l16, s16 = run("bfloat16")
    assert np.isfinite(l16).all()
    np.testing.assert_allclose(l16, l32, rtol=5e-3)
    # score updates stay directionally identical within bf16 rounding
    assert np.abs(s16 - s32).max() < 5e-4


@pytest.mark.parametrize("sq,sk", [(14, 14), (36, 36), (14, 36), (36, 14)])
def test_q_pair_matches_reference(sq, sk, monkeypatch):
    """Batch-pair formulation (Q_PAIR): two batch rows per dot with the
    cross-item quadrant masked — values AND grads must equal the reference
    exactly (the quadrant's probs underflow to exact zeros)."""
    from crvqa_tpu.ops import fused_attention as fa

    monkeypatch.setattr(fa, "Q_PAIR", True)
    q, k, v, bias = _inputs(sq, sk, batch=8)
    out = fa.fused_attention(q, k, v, bias, H, D, 0.0, True)
    ref = fa.reference_attention(q, k, v, bias, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    tgt = jnp.asarray(np.random.default_rng(2).normal(
        size=(q.shape[0], sq, H * D)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((fa.fused_attention(q, k, v, bias, H, D, 0.0, True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((fa.reference_attention(q, k, v, bias, H, D)
                        - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_q_pair_dropout_fwd_bwd_consistent(monkeypatch):
    """Pair-mode dropout: the stored backward regenerates the forward's
    mask (same pair-indexed counter hash) — grads of a dropout-through loss
    must match autodiff of an explicitly-masked reference."""
    from crvqa_tpu.ops import fused_attention as fa

    monkeypatch.setattr(fa, "Q_PAIR", True)
    q, k, v, bias = _inputs(14, 36, batch=8)
    seed = jnp.asarray([7], jnp.int32)
    rate = 0.3

    out1 = fa.fused_attention_seeded(q, k, v, bias, seed, H, D, rate, True)
    out2 = fa.fused_attention_seeded(q, k, v, bias, seed, H, D, rate, True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # grad is finite and deterministic under the same seed
    def loss(q):
        return jnp.sum(fa.fused_attention_seeded(
            q, k, v, bias, seed, H, D, rate, True) ** 2)

    g1 = jax.grad(loss)(q)
    g2 = jax.grad(loss)(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.isfinite(np.asarray(g1)).all()


@pytest.mark.parametrize("sq,sk", [(14, 14), (36, 36), (14, 36), (36, 14)])
def test_head_group_matches_reference(sq, sk, monkeypatch):
    """Head-group formulation (HEAD_GROUP=2): per-group 2-head dots with
    2-fold block-diagonal redundancy — values AND grads must equal the
    reference (the recompute backward path)."""
    from crvqa_tpu.ops import fused_attention as fa

    monkeypatch.setattr(fa, "HEAD_GROUP", 2)
    q, k, v, bias = _inputs(sq, sk, batch=8)
    out = fa.fused_attention(q, k, v, bias, H, D, 0.0, True)
    ref = fa.reference_attention(q, k, v, bias, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    tgt = jnp.asarray(np.random.default_rng(3).normal(
        size=(q.shape[0], sq, H * D)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum((fa.fused_attention(q, k, v, bias, H, D, 0.0, True)
                        - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((fa.reference_attention(q, k, v, bias, H, D)
                        - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_head_group_dropout_fwd_bwd_consistent(monkeypatch):
    """Grouped-mode dropout: the recompute backward regenerates the
    forward's group-indexed counter-hash mask — deterministic outputs and
    finite deterministic grads under a fixed seed."""
    from crvqa_tpu.ops import fused_attention as fa

    monkeypatch.setattr(fa, "HEAD_GROUP", 2)
    q, k, v, bias = _inputs(14, 36, batch=8)
    seed = jnp.asarray([11], jnp.int32)
    rate = 0.3

    out1 = fa.fused_attention_seeded(q, k, v, bias, seed, H, D, rate, True)
    out2 = fa.fused_attention_seeded(q, k, v, bias, seed, H, D, rate, True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def loss(q):
        return jnp.sum(fa.fused_attention_seeded(
            q, k, v, bias, seed, H, D, rate, True) ** 2)

    g1 = jax.grad(loss)(q)
    g2 = jax.grad(loss)(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.isfinite(np.asarray(g1)).all()
