"""Scan-over-layers LXMERT: stacked layer params under `lax.scan`.

The default `models/lxmert.py` unrolls 9+5+5 layers so every layer gets its
own param path (simple torch-name interop, but a large HLO: each masked
matmul appears 168 times, and first compile through a remote-compile TPU
tunnel runs minutes). This variant stacks each homogeneous layer group's
params with a leading layer axis and runs the group as ONE `nn.scan` body:

- HLO size shrinks ~#layers-fold per group (one traced body per group);
- per-layer kth-value threshold resets become a single batched sort
  (`Masker` handles specs with `stacked=L` via vmap);
- the stacked layout is the natural one for pipelining/bigger configs.

`stack_params` / `unstack_params` convert between the two layouts, so all
torch-interop (stage-1 .bin loading, mask.pt export via per-layer names)
keeps flowing through the unrolled representation.

Numerics are identical to the unrolled model given converted params
(verified by tests/test_lxmert_scan.py).

MEASURED TRADE-OFF (v5e, full-size stage-2 LMH step, bs 256): step compile
53 s vs 162 s unrolled (3x faster — the win this variant exists for), but
steady-state step 176 ms vs ~120 ms unrolled: `lax.scan` fences cross-layer
fusion/pipelining that XLA exploits in the unrolled graph. Default stays
unrolled; pick `--scan_layers` for development iteration loops, big-config
experiments, or compile-time-bound environments.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import traverse_util

from .classifier import SimpleClassifier
from .layers import TransformerLayer, extend_attention_mask
from .lxmert import (
    LxmertConfig,
    LxmertEmbeddings,
    LxmertPooler,
    LxmertVisualFeatureEncoder,
    LxmertXLayer,
)

class _ScanSelfLayer(nn.Module):
    """Scan body for the homogeneous self-attention groups. `collect=True`
    emits each layer's output as a scan y (stacked [L, B, S, H]) for
    layer-wise KD; unused ys are DCE'd by XLA when False."""

    config: LxmertConfig
    collect: bool = False

    @nn.compact
    def __call__(self, carry, bias_and_det):
        c = self.config
        bias, deterministic = bias_and_det
        out = TransformerLayer(
            num_heads=c.num_attention_heads, head_size=c.head_size,
            hidden_size=c.hidden_size, intermediate_size=c.intermediate_size,
            act=c.hidden_act, attn_dropout=c.attention_probs_dropout_prob,
            hidden_dropout=c.hidden_dropout_prob, dtype=c.dtype, name="body",
        )(carry, bias, deterministic)
        return out, (out if self.collect else None)


class _ScanXLayer(nn.Module):
    """Scan body for the cross-modality group (carry = (lang, visn))."""

    config: LxmertConfig
    collect: bool = False

    @nn.compact
    def __call__(self, carry, biases_and_det):
        lang, visn = carry
        lang_bias, visn_bias, deterministic = biases_and_det
        lang, visn = LxmertXLayer(self.config, name="body")(
            lang, lang_bias, visn, visn_bias, deterministic)
        return (lang, visn), (lang if self.collect else None)


class ScanLxmertEncoder(nn.Module):
    config: LxmertConfig

    @nn.compact
    def __call__(self, lang_feats, lang_bias, visual_feats, visual_pos,
                 visn_bias=None, deterministic=True, collect_hidden=False):
        c = self.config
        if c.lang_num_heads is not None or c.lang_intermediate_size is not None:
            raise ValueError(
                "compaction overrides (lang_num_heads/lang_intermediate_size) "
                "are an unrolled-model feature; the scan groups are "
                "homogeneous — use models.lxmert.LxmertForVQA")
        visn = LxmertVisualFeatureEncoder(c, name="visn_fc")(
            visual_feats, visual_pos, deterministic)

        def scan_self(length):
            return nn.scan(
                _ScanSelfLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=length,
            )

        lang, lang_ys = scan_self(c.l_layers)(c, collect_hidden,
                                              name="layers_l")(
            lang_feats, (lang_bias, deterministic))
        visn, _ = scan_self(c.r_layers)(c, name="layers_r")(
            visn, (visn_bias, deterministic))
        scan_x = nn.scan(
            _ScanXLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast,
            length=c.x_layers,
        )
        (lang, visn), x_ys = scan_x(c, collect_hidden, name="layers_x")(
            (lang, visn), (lang_bias, visn_bias, deterministic))
        if collect_hidden:
            # same list contract as LxmertEncoder: embedding output + after
            # every lang layer + after every x layer (lang branch)
            hidden = ([lang_feats]
                      + [lang_ys[i] for i in range(c.l_layers)]
                      + [x_ys[i] for i in range(c.x_layers)])
            return lang, visn, hidden
        return lang, visn


class ScanLxmertForVQA(nn.Module):
    """Drop-in alternative to LxmertForVQA with scanned layer groups."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_attention_mask=None,
                 token_type_ids=None, deterministic=True,
                 collect_hidden=False):
        """Same return contract as LxmertForVQA, incl. `collect_hidden=True`
        -> (logits, pooled, hidden) for layer-wise KD."""
        c = self.config
        lang_bias = extend_attention_mask(attention_mask)
        visn_bias = extend_attention_mask(visual_attention_mask)

        class _Backbone(nn.Module):
            config: LxmertConfig

            @nn.compact
            def __call__(self, input_ids, visual_feats, visual_pos,
                         lang_bias, visn_bias, token_type_ids, deterministic,
                         collect_hidden):
                cc = self.config
                emb = LxmertEmbeddings(cc, name="embeddings")(
                    input_ids, token_type_ids, deterministic)
                out = ScanLxmertEncoder(cc, name="encoder")(
                    emb, lang_bias, visual_feats, visual_pos, visn_bias,
                    deterministic, collect_hidden=collect_hidden)
                pooled = LxmertPooler(cc, name="pooler")(out[0])
                return out + (pooled,)

        out = _Backbone(c, name="lxmert")(
            input_ids, visual_feats, visual_pos, lang_bias, visn_bias,
            token_type_ids, deterministic, collect_hidden)
        pooled = out[-1]
        logits = SimpleClassifier(
            hid_dim=2 * c.hidden_size, out_dim=c.ans_num,
            dropout=c.classifier_dropout, dtype=c.dtype, name="classifier",
        )(pooled, deterministic=deterministic)
        if collect_hidden:
            return (logits.astype(jnp.float32), pooled.astype(jnp.float32),
                    out[2])
        return logits.astype(jnp.float32), pooled.astype(jnp.float32)


# --------------------------------------------------------- layout converters

def stack_params(unrolled: Any, config: LxmertConfig) -> Any:
    """Unrolled param tree (layer_0..layer_N) -> scanned tree (stacked)."""
    flat = traverse_util.flatten_dict(unrolled)
    out: dict = {}
    lengths = {"layer": config.l_layers, "r_layers": config.r_layers,
               "x_layers": config.x_layers}
    group_name = {"layer": "layers_l", "r_layers": "layers_r",
                  "x_layers": "layers_x"}
    buckets: dict = {}
    for path, v in flat.items():
        if len(path) > 2 and path[0] == "lxmert" and path[1] == "encoder" \
                and "_" in path[2]:
            stem, idx = path[2].rsplit("_", 1)
            if stem in lengths and idx.isdigit():
                rest = path[3:]
                buckets.setdefault((stem, rest), {})[int(idx)] = v
                continue
        out[path] = v
    for (stem, rest), by_layer in buckets.items():
        stacked = jnp.stack([by_layer[i] for i in range(lengths[stem])])
        out[("lxmert", "encoder", group_name[stem], "body") + rest] = stacked
    return traverse_util.unflatten_dict(out)


def unstack_params(scanned: Any, config: LxmertConfig) -> Any:
    """Scanned param tree -> unrolled tree (for torch interop/export)."""
    flat = traverse_util.flatten_dict(scanned)
    out: dict = {}
    stem_for = {"layers_l": "layer", "layers_r": "r_layers",
                "layers_x": "x_layers"}
    for path, v in flat.items():
        if len(path) > 3 and path[0] == "lxmert" and path[1] == "encoder" \
                and path[2] in stem_for and path[3] == "body":
            stem = stem_for[path[2]]
            rest = path[4:]
            for i in range(v.shape[0]):
                out[("lxmert", "encoder", f"{stem}_{i}") + rest] = v[i]
            continue
        out[path] = v
    return traverse_util.unflatten_dict(out)
