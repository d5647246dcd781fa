"""Mid-sequence attention kernel (ops/midseq_attention.py), interpret mode:
forward/backward equivalence vs the XLA reference at padded/unpadded shapes
(incl. the 577-patch-like case), dropout fwd/bwd mask consistency, the
head-group layout fallback, the supported() budget, and the model-level
dispatch (ViT self-attention, MultiHeadAttention cross-attention; causal
biases must stay on the XLA path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.models import layers
from crvqa_tpu.ops import midseq_attention as ma
from crvqa_tpu.ops.fused_attention import reference_attention


def _inputs(sq, sk, h, d, batch=3, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(batch, sq, h * d)), dtype)
    k = jnp.asarray(rng.normal(size=(batch, sk, h * d)), dtype)
    v = jnp.asarray(rng.normal(size=(batch, sk, h * d)), dtype)
    bias = np.zeros((batch, sk), np.float32)
    bias[:, sk - 2:] = -10000.0  # padded keys
    return q, k, v, jnp.asarray(bias)


ZSEED = jnp.zeros((1,), jnp.int32)


# (sq, sk, h, d): unaligned seqs exercising both pad dims; h*d=128 -> hg=2;
# (29, 77, 3, 40) has no 128-aligned head group -> full-width fallback
@pytest.mark.parametrize("sq,sk,h,d", [
    (37, 133, 2, 64), (16, 256, 2, 64), (133, 133, 4, 32), (29, 77, 3, 40),
])
def test_forward_matches_reference(sq, sk, h, d):
    q, k, v, bias = _inputs(sq, sk, h, d)
    out = ma.midseq_attention_seeded(q, k, v, bias, ZSEED, h, d, 0.0, True)
    ref = reference_attention(q, k, v, bias, h, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_reference():
    h, d = 2, 64
    q, k, v, bias = _inputs(37, 133, h, d)
    tgt = jnp.asarray(np.random.default_rng(1).normal(
        size=(q.shape[0], 37, h * d)), jnp.float32)

    def loss(att):
        def l(q, k, v):
            return jnp.sum((att(q, k, v) - tgt) ** 2)
        return l

    gm = jax.grad(loss(lambda q, k, v: ma.midseq_attention_seeded(
        q, k, v, bias, ZSEED, h, d, 0.0, True)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: reference_attention(
        q, k, v, bias, h, d)), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gm, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_dropout_bwd_uses_same_mask_as_fwd():
    """The output is linear in v for a FIXED dropout mask, so the vjp-based
    directional derivative must equal the exact finite difference — which
    only holds when the recompute backward regenerates the forward's mask."""
    h, d, rate = 3, 40, 0.13
    q, k, v, bias = _inputs(29, 77, h, d, seed=2)
    seed = jnp.asarray([1234], jnp.int32)
    rng = np.random.default_rng(3)

    def f(v):
        return ma.midseq_attention_seeded(q, k, v, bias, seed, h, d, rate,
                                          True)

    uo = jnp.asarray(rng.normal(size=f(v).shape), jnp.float32)
    uv = jnp.asarray(rng.normal(size=v.shape), jnp.float32)
    g = jax.grad(lambda v: jnp.vdot(f(v), uo))(v)
    exact = jnp.vdot(f(v + 0.5 * uv) - f(v - 0.5 * uv), uo)
    np.testing.assert_allclose(float(jnp.vdot(g, uv)), float(exact),
                               rtol=1e-4)


def test_dropout_statistics_and_seed():
    h, d, rate = 2, 64, 0.5
    q, k, v, bias = _inputs(64, 128, h, d, seed=4)
    s1 = jnp.asarray([7], jnp.int32)
    o1 = ma.midseq_attention_seeded(q, k, v, bias, s1, h, d, rate, True)
    o1b = ma.midseq_attention_seeded(q, k, v, bias, s1, h, d, rate, True)
    o2 = ma.midseq_attention_seeded(q, k, v, bias,
                                    jnp.asarray([8], jnp.int32), h, d, rate,
                                    True)
    assert bool(jnp.all(o1 == o1b))          # same seed -> deterministic
    assert bool(jnp.any(o1 != o2))           # seed matters
    ref = reference_attention(q, k, v, bias, h, d)
    assert bool(jnp.any(o1 != ref))          # dropout actually applied


def test_bfloat16_path():
    h, d = 2, 64
    q, k, v, bias = _inputs(37, 133, h, d, dtype=jnp.bfloat16)
    out = ma.midseq_attention_seeded(q, k, v, bias, ZSEED, h, d, 0.0, True)
    ref = reference_attention(q, k, v, bias, h, d)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_supported_budget():
    # ViT-B/16 @ 384 (577 tokens, 12 heads x 64): the target case
    assert ma.supported(16, 577, 577, 12, 64, 2)
    # text->image cross-attention
    assert ma.supported(16, 50, 577, 12, 64, 2)
    # far past the VMEM budget: square attention at 4k tokens
    assert not ma.supported(16, 4096, 4096, 12, 64, 2)
    assert ma._pick_hg(12, 64) == 2
    assert ma._pick_hg(3, 40) == 3  # no 128-aligned group -> full width


def test_vit_equivalence():
    from crvqa_tpu.models.mplug.vit import ViTConfig, VisionTransformer

    # 145 tokens x 8 heads = 1160 > 1024: past the mid-length lower bound,
    # so the kernel actually dispatches (short tiny configs stay on XLA)
    c = ViTConfig(image_res=192, patch_size=16, width=256, layers=1, heads=8)
    m = VisionTransformer(c)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(1, 192, 192, 3)),
                       jnp.float32)
    params = m.init(jax.random.PRNGKey(0), imgs)["params"]
    out0 = m.apply({"params": params}, imgs, deterministic=True)
    layers.MIDSEQ_ATTENTION = True
    layers.FUSED_ATTENTION_INTERPRET = True
    try:
        out1 = m.apply({"params": params}, imgs, deterministic=True)
    finally:
        layers.MIDSEQ_ATTENTION = False
        layers.FUSED_ATTENTION_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)


def test_mha_dispatch_and_causal_fallback(monkeypatch):
    """Key-wise biases take the kernel; the decoder's causal [B,1,L,L] bias
    must stay on the XLA path (the kernel has no per-query bias)."""
    calls = []
    real = ma.midseq_attention_seeded

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ma, "midseq_attention_seeded", spy)
    monkeypatch.setattr(layers, "MIDSEQ_ATTENTION", True)
    monkeypatch.setattr(layers, "FUSED_ATTENTION_INTERPRET", True)
    rng = np.random.default_rng(5)
    mha = layers.MultiHeadAttention(num_heads=2, head_size=64,
                                    dropout_rate=0.1)
    # 600 keys x 2 heads = 1200 > 1024 -> mid-length tier (short contexts
    # must NOT take the kernel: the x128 lane padding would dominate)
    hid = jnp.asarray(rng.normal(size=(2, 9, 128)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 600, 128)), jnp.float32)
    keybias = jnp.zeros((2, 1, 1, 600), jnp.float32)
    params = mha.init(jax.random.PRNGKey(1), hid, ctx, keybias)["params"]

    out = mha.apply({"params": params}, hid, ctx, keybias, True)
    assert calls, "key-wise bias should dispatch to the midseq kernel"
    monkeypatch.setattr(layers, "MIDSEQ_ATTENTION", False)
    ref = mha.apply({"params": params}, hid, ctx, keybias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # short contexts (H*Sk <= 1024) must stay off the kernel even with the
    # flag on — the x128 key padding would dominate a 300-key context
    monkeypatch.setattr(layers, "MIDSEQ_ATTENTION", True)
    calls.clear()
    short_ctx = ctx[:, :300]
    p_s = mha.init(jax.random.PRNGKey(3), hid, short_ctx,
                   keybias[..., :300])["params"]
    mha.apply({"params": p_s}, hid, short_ctx, keybias[..., :300], True)
    assert not calls, "short context must not take the midseq kernel"

    # causal self-attention: [B, 1, L, L] bias -> XLA path only, even at
    # mid length (the kernel has no per-query bias)
    calls.clear()
    long_hid = jnp.asarray(rng.normal(size=(1, 600, 128)), jnp.float32)
    causal = jnp.where(
        jnp.tril(jnp.ones((600, 600), bool))[None, None], 0.0, -10000.0)
    p2 = mha.init(jax.random.PRNGKey(2), long_hid, long_hid,
                  causal)["params"]
    mha.apply({"params": p2}, long_hid, long_hid, causal, True)
    assert not calls, "causal bias must not take the midseq kernel"


def test_grouped_decoder_cross_attention_kernel(monkeypatch):
    """The grouped decoder cross-attention (memory_groups=A: queries
    (B, A*L) over an unreplicated mid-length memory) is a new kernel input
    shape class — it must dispatch to the midseq kernel and match the XLA
    path."""
    from crvqa_tpu.models.mplug.bert import MPlugBertConfig, TextDecoder

    calls = []
    real = ma.midseq_attention_seeded

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ma, "midseq_attention_seeded", spy)
    # 4 heads x 300 memory tokens = 1200 > 1024 -> mid-length tier
    c = MPlugBertConfig.tiny()
    dec = TextDecoder(c)
    rng = np.random.default_rng(11)
    b, a, l, sk = 2, 3, 4, 300
    ids = jnp.asarray(rng.integers(1, c.vocab_size, (b * a, l)), jnp.int32)
    mask = jnp.ones((b * a, l), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(b, sk, c.hidden_size)), jnp.float32)
    enc_mask = jnp.ones((b, sk), jnp.float32)
    params = dec.init(jax.random.PRNGKey(2), ids, mask, enc, enc_mask,
                      memory_groups=a)["params"]

    monkeypatch.setattr(layers, "MIDSEQ_ATTENTION", True)
    monkeypatch.setattr(layers, "FUSED_ATTENTION_INTERPRET", True)
    out_k = dec.apply({"params": params}, ids, mask, enc, enc_mask,
                      memory_groups=a)
    assert calls, "grouped cross-attention should take the midseq kernel"

    monkeypatch.setattr(layers, "MIDSEQ_ATTENTION", False)
    out_x = dec.apply({"params": params}, ids, mask, enc, enc_mask,
                      memory_groups=a)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
