"""Shared flax building blocks.

Param paths are chosen to map 1:1 onto the reference PyTorch module names
(see `crvqa_tpu.core.torch_compat`) so that stage-boundary artifacts
(`mask.pt`, classifier pickles) stay bit-compatible.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

def gelu(x):
    """Dtype-adaptive gelu — the single gelu used across the model zoo.

    The reference's "gelu" is torch F.gelu = EXACT erf gelu
    (hg_transformers/activations.py:32-35), NOT the tanh approximation
    (flax's nn.gelu default). In fp32 we match it exactly (oracle-tested in
    tests/test_ref_oracle_lxmert.py / test_ref_oracle_mplug.py).

    In bf16 the erf lowering is a measured 12% of the WHOLE stage-2 step on
    v5e (3050 vs 3469 ex/s — TPU's VPU has a fast tanh unit, erf lowers to a
    long polynomial), while the tanh form's absolute error vs erf is
    <= 4.8e-4 — below the bf16 rounding granularity of the surrounding FFN
    activations (ulp = 3.9e-3 at |v| in [1, 2)); elementwise relative error
    exceeds rounding only where gelu outputs are exponentially small
    (|out| < ~1e-3), whose absolute contribution to the next 3072-wide
    matmul is negligible. bf16 therefore takes the tanh form; end-to-end
    gradient deviation is bounded by
    tests/test_bf16_policy.py::test_bf16_tanh_gelu_guard.
    """
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


ACT2FN: dict[str, Callable] = {
    "gelu": gelu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
}

# Attention einsum spelling. The math is identical; the spelling steers
# XLA's layout assignment for the batched dots. The profile
# (benchmarks/profile_stage2.py) showed the default 'bqhd' spelling costs
# ~146 transpose copies (~15.8 ms, 19%) per stage-2 step on v5e —
# bf16[256,12,64,36] copies materializing v in [B,H,D,S] for the ctx dot.
#   'bqhd' — heads stay in dim 2, einsum directly from the split layout.
#   'bhqd' — explicit one-shot transpose to [B,H,S,D] after the split,
#            dots run with leading batch dims.
#   'bqhk' — scores/ctx keep the q-major layout throughout.
# Read at trace time; benchmarks/bench_attention_layout.py measures all
# three end-to-end and the default tracks the measured winner.
ATTN_LAYOUT = "bqhd"

# Fused short-seq attention kernel (ops/fused_attention.py): consumes q/k/v
# in the projection layout and keeps scores/probs in VMEM, eliminating the
# transpose copies XLA's batched dots materialize (~19% of the stage-2 step;
# see the kernel docstring for the measured story). Trace-time switches:
# FUSED_ATTENTION enables it on the self/cross attention path (kv-cache
# generation paths keep the XLA einsums), FUSED_ATTENTION_INTERPRET runs the
# kernel interpreted (CPU tests).
FUSED_ATTENTION = False
FUSED_ATTENTION_INTERPRET = False

# Mid-sequence attention kernel (ops/midseq_attention.py): per-(batch,
# head-group) full-row softmax in VMEM for the contexts the short-seq
# kernel's H*S <= 1024 guard rejects — mPLUG's 577-patch image attention
# (ViT self-attention, fusion cross-/joint attention). Keeps the [B,H,S,S]
# probability tensor out of HBM entirely. Trace-time switch, same interpret
# convention as FUSED_ATTENTION.
MIDSEQ_ATTENTION = False


def kernel_bias_and_seed(module, attention_bias, q, k, deterministic,
                         rate=None):
    """The shared kernel-input contract for the fused/midseq attention
    kernels: squeeze a key-wise [B, 1, 1, Sk] additive bias (or None) to
    the [B, Sk] fp32 the kernels consume, and derive the int32[1]
    counter-hash dropout seed from the module's 'dropout' rng stream (only
    drawn when dropout is live, so deterministic traces stay rng-free).
    Returns (bias2d, seed, rate)."""
    if attention_bias is None:
        bias2d = jnp.zeros((q.shape[0], k.shape[1]), jnp.float32)
    else:  # [B, 1, 1, Sk] additive -> [B, Sk]
        bias2d = attention_bias.astype(jnp.float32)[:, 0, 0, :]
    if rate is None:
        rate = module.dropout_rate
    rate = 0.0 if deterministic else rate
    if rate > 0.0:
        key_data = jax.random.key_data(module.make_rng("dropout"))
        seed = key_data.ravel()[:1].astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return bias2d, seed, rate

# Bidirectional cross-attention batching (LxmertXLayer): project q/k/v and
# the output dense ONCE over the [lang; visn] concatenation instead of two
# calls of the shared `visual_attention` module — same math and params,
# half the dispatches at double the rows. Read at trace time.
JOINT_CROSS_ATTENTION = False


class WeightNormDense(nn.Module):
    """Dense with torch-style weight normalization, dim=None (scalar g).

    `weight_norm(nn.Linear(...), dim=None)` as used by `SimpleClassifier`
    (`hg_transformers/classifier.py:13-16`, `fc.py:7-19`): W = g * V/||V||_F
    with a single scalar g initialized to ||W_init||_F.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_features)

        def v_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        v = self.param("v", v_init, (in_features, self.features), self.param_dtype)
        g = self.param("g", lambda k, s, d: jnp.linalg.norm(v).reshape(s).astype(d),
                       (1,), self.param_dtype)
        kernel = (g / jnp.maximum(jnp.linalg.norm(v), 1e-12)) * v
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", v_init, (self.features,), self.param_dtype)
            y = y + b.astype(self.dtype)
        return y


class PadFrozenEmbed(nn.Embed):
    """nn.Embed with torch `nn.Embedding(padding_idx=pad_idx)` GRAD
    semantics: the forward is an ordinary gather, but the padding row
    receives NO gradient (torch zeroes it inside the embedding backward).
    The reference builds every text embedding this way
    (`modeling_lxmert.py:734-736` — word AND position AND token-type;
    `modeling_mplug.py:173`, `modeling_visualbert.py:82` — word), so without
    this the [PAD] row trains here and — worse — its spurious gradient
    enters `clip_grad_norm`'s global norm, perturbing EVERY tensor's update
    (caught by the stage-1 trajectory rehearsal). Row-level grad surgery has
    no explicit-signature spelling, hence the one sanctioned stop_gradient:
    a substituted stopped row in the gathered table. Same param path as
    nn.Embed ("<name>/embedding") — checkpoint-compatible; `attend` (the
    tied LM head) is inherited UNfrozen, matching torch, where padding_idx
    only affects the embedding op, not the tied linear."""

    pad_idx: int = 0

    def __call__(self, inputs):
        # jnp.asarray: apply() may receive raw numpy leaves (torch interop)
        table = jnp.asarray(self.embedding)
        y = jnp.take(table, inputs, axis=0)
        # Zero the cotangent where input == pad_idx: gathers of the pad id
        # are the ONLY writers of the pad row in the gather's backward
        # scatter-add, so this equals torch's zeroed grad row — at [B,S,H]
        # activation cost instead of the vocab-table copy an
        # `.at[pad].set(stop_gradient(...))` spelling pays per step.
        keep = (inputs != self.pad_idx)[..., None]
        return jnp.where(keep, y, jax.lax.stop_gradient(y))


class MultiHeadAttention(nn.Module):
    """LXMERT/BERT-style attention over an explicit context.

    Functional equivalent of `LxmertAttention` (`modeling_lxmert.py:769-827`):
    separate query/key/value Dense, additive attention-mask bias, softmax in
    fp32, attention-prob dropout. The module is generic over self- vs
    cross-attention via the `context` argument; cross-modality weight SHARING
    (one `visual_attention` used in both directions,
    `modeling_lxmert.py:947-958`) falls out of calling one instance twice.
    """

    num_heads: int
    head_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context, attention_bias=None, deterministic=True,
                 kv=None, joint_split=None, joint_biases=None,
                 self_cache=None, cache_position=None):
        """`kv`: optional precomputed (k, v) head-split projections of the
        context ([B, S, heads, head_size] each). Generation caches the
        cross-attention K/V of the static encoder memory once instead of
        recomputing them every decode step (see models/mplug/generator.py).

        `self_cache`/`cache_position`: incremental self-attention — the
        growing-prefix analogue of `kv` for autoregressive decoding; returns
        (out, updated_cache) instead of out.

        `joint_split`/`joint_biases`: bidirectional cross-attention over
        SHARED weights (LxmertXLayer's one `visual_attention` called for
        both directions, modeling_lxmert.py:947-958). `hidden` is the
        [lang; visn] concatenation; q/k/v are projected ONCE over the
        concat (half the projection dispatches, double their rows), then
        rows [:split] attend keys [split:] and vice versa. `joint_biases`
        = (lang_bias, visn_bias) additive masks; `context` is ignored."""
        d = self.num_heads * self.head_size
        dense = lambda name: nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense("query")(hidden)

        if joint_split is not None:
            s = joint_split
            k = dense("key")(hidden)
            v = dense("value")(hidden)
            lang_bias, visn_bias = joint_biases
            ctx_l = self._attend(q[:, :s], k[:, s:], v[:, s:], visn_bias,
                                 deterministic)
            ctx_v = self._attend(q[:, s:], k[:, :s], v[:, :s], lang_bias,
                                 deterministic)
            return jnp.concatenate([ctx_l, ctx_v], axis=1)

        if self_cache is not None:
            # incremental decode: `hidden`/`context` is the single new row
            # [N, 1, D]; project it, write k/v into the cache at
            # cache_position, attend the one query row over the whole cache
            # (future rows are zeros the caller's key bias masks out).
            # Returns (out, updated_cache) — beam search reorders the cache
            # by parent beam, which is exactly the reference predictor's
            # map_batch_fn state reindexing (mPLUG/models/predictor.py:243).
            k_cache, v_cache = self_cache
            k_new = self._split_heads(dense("key")(context))
            v_new = self._split_heads(dense("value")(context))
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k_new.astype(k_cache.dtype), cache_position, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v_new.astype(v_cache.dtype), cache_position, axis=1)
            out = self._attend_heads(self._split_heads(q), k_cache, v_cache,
                                     attention_bias, deterministic)
            return out, (k_cache, v_cache)

        if kv is None:
            return self._attend(q, dense("key")(context),
                                dense("value")(context), attention_bias,
                                deterministic)
        # init/training always take the kv=None path, so the key/value
        # params exist; the cache path simply doesn't touch them
        k, v = kv
        return self._attend_heads(self._split_heads(q), k, v, attention_bias,
                                  deterministic)

    def _split_heads(self, t):
        return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                         self.head_size)

    def _attend(self, q, k, v, attention_bias, deterministic):
        """Dispatch on flat [B, S, H*D] projections: the lane-blocked fused
        kernel builds [H*Sk, H*Sk] / [H*Sk, H*D] masks in VMEM — only
        profitable (and only safe) for short contexts. LXMERT (H*Sk <= 432)
        and mPLUG text towers (<= 960) qualify; mPLUG's image
        cross-attention (Sk = 577 patches) goes to the mid-length kernel
        when enabled, else XLA.

        The kernel consumes a KEY-wise bias [B, Sk]: only query-independent
        biases (None or broadcast [B, 1, 1, Sk] padding masks) are eligible
        — a causal [B, 1, L, L] bias (mPLUG's decoder) must take the XLA
        path, where the full matrix applies. `fused_attention.supported`
        additionally rejects batch/shape combinations with no feasible
        Mosaic batch tile (odd large batches, fp32 long rows)."""
        from ..ops import fused_attention as fa

        bias_keywise = (attention_bias is None
                        or (attention_bias.ndim == 4
                            and attention_bias.shape[1] == 1
                            and attention_bias.shape[2] == 1))
        short = (k.shape[1] * self.num_heads <= 1024
                 and q.shape[1] * self.num_heads <= 1024)
        fits = (short and bias_keywise
                and fa.supported(q.shape[0], q.shape[1], k.shape[1],
                                 self.num_heads, self.head_size,
                                 jnp.dtype(q.dtype).itemsize))
        if FUSED_ATTENTION and fits:
            from ..ops.fused_attention import fused_attention_seeded

            bias2d, seed, rate = kernel_bias_and_seed(
                self, attention_bias, q, k, deterministic)
            return fused_attention_seeded(
                q, k, v, bias2d, seed, self.num_heads, self.head_size,
                rate, FUSED_ATTENTION_INTERPRET)

        # mid-length tier: ONLY the contexts out of the short-seq kernel's
        # scope (a 14-key LXMERT layer padded to 128 lanes would be ~9x
        # wasted dot width — short contexts stay on fused/XLA)
        if MIDSEQ_ATTENTION and bias_keywise and not short:
            from ..ops import midseq_attention as ma

            if ma.supported(q.shape[0], q.shape[1], k.shape[1],
                            self.num_heads, self.head_size,
                            jnp.dtype(q.dtype).itemsize):
                bias2d, seed, rate = kernel_bias_and_seed(
                    self, attention_bias, q, k, deterministic)
                return ma.midseq_attention_seeded(
                    q, k, v, bias2d, seed, self.num_heads, self.head_size,
                    rate, FUSED_ATTENTION_INTERPRET)

        return self._attend_heads(self._split_heads(q), self._split_heads(k),
                                  self._split_heads(v), attention_bias,
                                  deterministic)

    def _attend_heads(self, q, k, v, attention_bias, deterministic):
        """XLA einsum attention on head-split [B, S, H, D] projections."""
        d = self.num_heads * self.head_size
        layout = ATTN_LAYOUT
        if layout == "bhqd":
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        elif layout == "bqhk":
            scores = jnp.einsum("bqhd,bkhd->bqhk", q, k).astype(jnp.float32)
        else:  # 'bqhd' default
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(self.head_size).astype(jnp.float32)
        if attention_bias is not None:
            bias = attention_bias.astype(jnp.float32)
            if layout == "bqhk":
                # scores are [B, Q, H, K]; a key-wise [B,1,1,K] bias keeps
                # its broadcast, a query-dependent (causal) [B,1,L,L] bias
                # moves its query axis to dim 1
                if bias.shape[2] == 1:
                    bias = bias.reshape(bias.shape[0], 1, 1, bias.shape[-1])
                else:
                    bias = jnp.swapaxes(bias, 1, 2)  # [B, Q, 1, K]
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout_rate)(probs, deterministic=deterministic)
        if layout == "bhqd":
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
        elif layout == "bqhk":
            ctx = jnp.einsum("bqhk,bkhd->bqhd", probs, v)
        else:
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(ctx.shape[0], ctx.shape[1], d)


class AttentionOutput(nn.Module):
    """dense -> dropout -> residual add -> LayerNorm
    (`LxmertAttentionOutput`, modeling_lxmert.py:833-845)."""

    hidden_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(hidden)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="LayerNorm")(h + residual)
        return h


class SelfAttentionLayer(nn.Module):
    """`LxmertSelfAttentionLayer` (modeling_lxmert.py:862-880):
    attention (named 'self') + output block."""

    num_heads: int
    head_size: int
    hidden_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True):
        att = MultiHeadAttention(
            self.num_heads, self.head_size, self.attn_dropout,
            self.dtype, self.param_dtype, name="self",
        )(x, x, attention_bias, deterministic)
        return AttentionOutput(
            self.hidden_size, self.hidden_dropout, self.dtype, self.param_dtype,
            name="output",
        )(att, x, deterministic)


class CrossAttentionLayer(nn.Module):
    """`LxmertCrossAttentionLayer` (modeling_lxmert.py:848-859):
    attention (named 'att') + output block."""

    num_heads: int
    head_size: int
    hidden_size: int
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ctx_attention_bias=None, deterministic=True,
                 joint_split=None, joint_biases=None):
        """joint mode (see MultiHeadAttention): `x` is the [lang; visn]
        concat, `context` ignored; the output dense + LayerNorm run once
        over the concat (per-row ops — identical to two calls of the same
        shared module)."""
        att = MultiHeadAttention(
            self.num_heads, self.head_size, self.attn_dropout,
            self.dtype, self.param_dtype, name="att",
        )(x, context, ctx_attention_bias, deterministic,
          joint_split=joint_split, joint_biases=joint_biases)
        return AttentionOutput(
            self.hidden_size, self.hidden_dropout, self.dtype, self.param_dtype,
            name="output",
        )(att, x, deterministic)


class Intermediate(nn.Module):
    """`LxmertIntermediate` (modeling_lxmert.py:883-893)."""

    intermediate_size: int
    act: str = "gelu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(x)
        return ACT2FN[self.act](h)


class FFNOutput(nn.Module):
    """`LxmertOutput` (modeling_lxmert.py:896-907)."""

    hidden_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        h = nn.Dense(self.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="dense")(hidden)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="LayerNorm")(h + residual)
        return h


class TransformerLayer(nn.Module):
    """Self-attention + FFN block (`LxmertLayer`, modeling_lxmert.py:910-925;
    identical to a BERT layer, reused by the VisualBERT stack)."""

    num_heads: int
    head_size: int
    hidden_size: int
    intermediate_size: int
    act: str = "gelu"
    attn_dropout: float = 0.1
    hidden_dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True):
        att = SelfAttentionLayer(
            self.num_heads, self.head_size, self.hidden_size,
            self.attn_dropout, self.hidden_dropout, self.dtype, self.param_dtype,
            name="attention",
        )(x, attention_bias, deterministic)
        inter = Intermediate(self.intermediate_size, self.act, self.dtype,
                             self.param_dtype, name="intermediate")(att)
        return FFNOutput(self.hidden_size, self.hidden_dropout, self.dtype,
                         self.param_dtype, name="output")(inter, att, deterministic)


def extend_attention_mask(mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """[B, L] 1/0 mask -> additive [B, 1, 1, L] bias with -10000 at pads
    (`LxmertModel.forward`, modeling_lxmert.py:1386-1402)."""
    if mask is None:
        return None
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]
